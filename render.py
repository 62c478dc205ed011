#!/usr/bin/env python
"""Render train/test sets of a trained model to PNGs.

Mirrors /root/reference/render.py: loads the model at --iteration (default
latest), writes <model>/{train,test}/ours_<iter>/{renders,gt}/%05d.png.
"""

import os
import sys
from argparse import ArgumentParser

import numpy as np

from sgs_tpu.utils.config import (
    ModelParams,
    PipelineParams,
    add_dataclass_args,
    extract_dataclass,
    get_combined_args,
)
from sgs_tpu.utils.general import safe_state


def save_png(path: str, image_chw) -> None:
    from PIL import Image

    arr = np.clip(np.asarray(image_chw), 0.0, 1.0)
    Image.fromarray((arr.transpose(1, 2, 0) * 255 + 0.5).astype(np.uint8)).save(path)


def render_set(model_path, name, iteration, views, pool, active_sh_degree,
               background, raster):
    import jax.numpy as jnp

    from sgs_tpu.train.loop import eval_render

    render_path = os.path.join(model_path, name, f"ours_{iteration}", "renders")
    gts_path = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(gts_path, exist_ok=True)
    for idx, view in enumerate(views):
        image = eval_render(
            pool, view.camera, background, active_sh_degree, **raster
        )
        save_png(os.path.join(render_path, f"{idx:05d}.png"), image)
        save_png(os.path.join(gts_path, f"{idx:05d}.png"), view.gt_image)


def _raster_kwargs(pipe, pool, cameras):
    """Production rasterizer settings for offline rendering: the tiled
    Pallas path with tight culling, buckets sized from a camera sample
    (the reference renders with its production CUDA rasterizer too;
    the O(N*P) oracle stays available via --rasterizer reference)."""
    from sgs_tpu.utils.config import resolve_raster_backend

    mode = getattr(pipe, "rasterizer", "tiled")
    backend = resolve_raster_backend(getattr(pipe, "raster_backend", "auto"))
    if mode != "tiled":
        return {"mode": mode}
    import random

    from sgs_tpu.train.loop import instance_bucket_sample

    tight = getattr(pipe, "tight_culling", True) and backend == "pallas"
    b = instance_bucket_sample(
        pool, cameras, random.Random(0), tight=tight
    )
    mi, mr, mk = b if tight else (b, 0, 0)
    return {
        "mode": mode, "backend": backend, "max_instances": mi,
        "max_row_instances": mr, "max_kernel_rows": mk,
    }


def render_sets(dataset, iteration, pipe, skip_train, skip_test):
    import jax.numpy as jnp

    from sgs_tpu.data.scene import Scene

    scene = Scene(dataset, load_iteration=iteration, shuffle=False)
    background = jnp.asarray(
        [1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0]
    )
    all_cams = scene.getTrainCameras() + scene.getTestCameras()
    raster = _raster_kwargs(pipe, scene.pool, all_cams)
    if not skip_train:
        render_set(
            dataset.model_path, "train", scene.loaded_iter, scene.getTrainCameras(),
            scene.pool, dataset.sh_degree, background, raster,
        )
    if not skip_test:
        render_set(
            dataset.model_path, "test", scene.loaded_iter, scene.getTestCameras(),
            scene.pool, dataset.sh_degree, background, raster,
        )


def main(argv=None):
    from sgs_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = ArgumentParser(description="Testing script parameters")
    add_dataclass_args(parser, ModelParams, "Loading Parameters", sentinel=True)
    add_dataclass_args(parser, PipelineParams, "Pipeline Parameters")
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    args = get_combined_args(parser, argv)
    print("Rendering " + args.model_path)
    safe_state(args.quiet)
    render_sets(
        extract_dataclass(ModelParams, args), args.iteration,
        extract_dataclass(PipelineParams, args), args.skip_train, args.skip_test,
    )


if __name__ == "__main__":
    main(sys.argv[1:])
