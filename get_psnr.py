#!/usr/bin/env python
"""Evaluate a checkpoint's PSNR over all train+test cameras and exit.

Mirrors /root/reference/get_psnr.py: loads either a standard train.py
checkpoint (.npz capture) or a raw vectorized (N, 11+3K) parameter tensor
(.npy — the MyGaussianModel.from_vector path for externally compressed /
reconstructed Gaussians), runs one training_report over every camera, and
writes losses.tsv.
"""

import os
import sys
from argparse import ArgumentParser

import numpy as np

from sgs_tpu.utils.config import (
    ModelParams,
    OptimizationParams,
    PipelineParams,
    add_dataclass_args,
    extract_dataclass,
)
from sgs_tpu.utils.general import safe_state


def main(argv=None):
    from sgs_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = ArgumentParser(description="get_psnr parameters")
    add_dataclass_args(parser, ModelParams, "Loading Parameters")
    add_dataclass_args(parser, OptimizationParams, "Optimization Parameters")
    add_dataclass_args(parser, PipelineParams, "Pipeline Parameters")
    parser.add_argument("--start_checkpoint", type=str, required=True)
    parser.add_argument("--quiet", action="store_true")
    args = parser.parse_args(argv)

    dataset = extract_dataclass(ModelParams, args)
    if not dataset.model_path:
        dataset.model_path = os.path.join("./output/", "get_psnr")
    safe_state(args.quiet)

    import jax.numpy as jnp

    from sgs_tpu.data.scene import Scene
    from sgs_tpu.train.trainer import training_report

    scene = Scene(dataset)
    active_sh_degree = dataset.sh_degree

    ckpt = args.start_checkpoint
    if ckpt.endswith(".npz"):
        from sgs_tpu.train.checkpoint import load_checkpoint

        state, iteration, active_sh_degree, _ = load_checkpoint(ckpt)
        pool = state.pool
    else:
        # raw vectorized tensor: (N, 11 + 3K) float — shape | appearance
        from sgs_tpu.models.vectorized import from_vector

        vec = np.load(ckpt)
        pool = from_vector(dataset.sh_degree, vec[:, :11], vec[:, 11:])
        iteration = 0

    bg = jnp.asarray([1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0])

    os.makedirs(dataset.model_path, exist_ok=True)
    tsv = open(os.path.join(dataset.model_path, "losses.tsv"), "w")
    tsv.write("iteration\ttest_l1\ttest_psnr\tnum_gaussians\n")

    # full_train_set: the reference's get_psnr.py:198-201 evaluates the
    # WHOLE train list (unlike train.py's range(5,30) subsample)
    training_report(
        tsv, iteration, scene, pool, active_sh_degree, bg, full_train_set=True
    )
    tsv.close()
    print("Done.")


if __name__ == "__main__":
    main(sys.argv[1:])
