#!/usr/bin/env python
"""Train a 3D Gaussian Splatting model on TPU.

CLI-compatible with the reference entry point
(/root/reference/train.py:219-246): same flags, defaults and outputs
(model dir with cfg_args/opt_args, losses.tsv, point_cloud/iteration_*/
point_cloud.ply snapshots, chkpnt<iter> checkpoints — .npz here).

Usage: python train.py -s <dataset> [-m <model_dir>] [--iterations N] ...
"""

import os
import sys
import uuid
from argparse import ArgumentParser, Namespace

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
    parser = ArgumentParser(description="Training script parameters")
    add_dataclass_args(parser, ModelParams, "Loading Parameters")
    add_dataclass_args(parser, OptimizationParams, "Optimization Parameters")
    add_dataclass_args(parser, PipelineParams, "Pipeline Parameters")
    save_iters = [1_000, 7_000, 15_000, 30_000]
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int, default=save_iters)
    parser.add_argument("--save_iterations", nargs="+", type=int, default=save_iters)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=save_iters)
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of the first "
                             "~20 iterations to this directory")
    args = parser.parse_args(argv)
    args.save_iterations.append(args.iterations)

    dataset = extract_dataclass(ModelParams, args)
    opt = extract_dataclass(OptimizationParams, args)
    pipe = extract_dataclass(PipelineParams, args)

    if not dataset.model_path:
        unique_str = os.getenv("OAR_JOB_ID") or str(uuid.uuid4())
        dataset.model_path = os.path.join("./output/", unique_str[0:10])
    print("Optimizing " + dataset.model_path)
    os.makedirs(dataset.model_path, exist_ok=True)
    with open(os.path.join(dataset.model_path, "opt_args"), "w") as f:
        f.write(str(Namespace(**{k: v for k, v in vars(opt).items() if not k.startswith("_")})))

    safe_state(args.quiet)
    if args.detect_anomaly:
        import jax

        jax.config.update("jax_debug_nans", True)

    from sgs_tpu.train.trainer import training

    if args.profile_dir:
        import jax

        jax.profiler.start_trace(args.profile_dir)
    training(
        dataset, opt, pipe,
        args.test_iterations, args.save_iterations, args.checkpoint_iterations,
        args.start_checkpoint,
    )
    if args.profile_dir:
        import jax

        jax.profiler.stop_trace()
    print("\nTraining complete.")


if __name__ == "__main__":
    main(sys.argv[1:])
