#!/usr/bin/env python
"""Train the latent/structured Gaussian model (autodecoder over clusters).

CLI-compatible with /root/reference/train_lgm.py:264-292: sh_degree must
be 0, densification is disabled, a single Adam over all parameters.
"""

import os
import sys
import uuid
from argparse import ArgumentParser

from sgs_tpu.utils.config import (
    ModelParams,
    OptimizationParams,
    PipelineParams,
    add_dataclass_args,
    extract_dataclass,
)
from sgs_tpu.utils.general import safe_state

DEFAULT_ITERS = [1, 100, 500, 1_000, 3_000, 7_000, 30_000, 45_000, 60_000, 75_000, 90_000]


def main(argv=None):
    from sgs_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = ArgumentParser(description="LGM training script parameters")
    add_dataclass_args(parser, ModelParams, "Loading Parameters")
    add_dataclass_args(parser, OptimizationParams, "Optimization Parameters")
    add_dataclass_args(parser, PipelineParams, "Pipeline Parameters")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int, default=DEFAULT_ITERS)
    parser.add_argument("--save_iterations", nargs="+", type=int, default=DEFAULT_ITERS)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--debug_latent", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=DEFAULT_ITERS)
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--latent_size", type=int, default=32)
    parser.add_argument("--hidden_size", type=int, default=32)
    parser.add_argument("--gaussians_per_structure", type=int, default=8)
    parser.add_argument("--use_positional_embedding", action="store_true")
    parser.add_argument("--downsample_init", type=float, default=1.0)
    args = parser.parse_args(argv)
    args.save_iterations.append(args.iterations)

    dataset = extract_dataclass(ModelParams, args)
    dataset.sh_degree = 0
    opt = extract_dataclass(OptimizationParams, args)
    pipe = extract_dataclass(PipelineParams, args)

    if not dataset.model_path:
        unique_str = os.getenv("OAR_JOB_ID") or str(uuid.uuid4())
        dataset.model_path = os.path.join("./output/", unique_str[0:10])
    print("Optimizing " + dataset.model_path)

    safe_state(args.quiet)

    # Network GUI serving (reference train_lgm.py polls it inline); start
    # the listener so the SIBR remote viewer can connect during training.
    try:
        from sgs_tpu.viewer import network_gui

        network_gui.init(args.ip, args.port)
    except OSError as e:
        print(f"network_gui disabled: {e}")

    from sgs_tpu.train.lgm_trainer import training_lgm

    training_lgm(
        dataset, opt, pipe,
        args.test_iterations, args.save_iterations, args.checkpoint_iterations,
        args.start_checkpoint,
        latent_size=args.latent_size,
        hidden_size=args.hidden_size,
        gaussians_per_structure=args.gaussians_per_structure,
        use_positional_embedding=args.use_positional_embedding,
        downsample_init=args.downsample_init,
    )
    print("\nTraining complete.")


if __name__ == "__main__":
    main(sys.argv[1:])
