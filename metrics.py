#!/usr/bin/env python
"""Compute SSIM/PSNR/LPIPS over rendered test sets.

Mirrors /root/reference/metrics.py: walks <model>/test/<method>/
{renders,gt}, writes results.json + per_view.json. LPIPS requires local
VGG weights (zero-egress environment); reported as null when absent.
"""

import json
import os
import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def read_images(renders_dir: Path, gt_dir: Path):
    from PIL import Image

    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        r = np.asarray(Image.open(renders_dir / fname), np.float32) / 255.0
        g = np.asarray(Image.open(gt_dir / fname), np.float32) / 255.0
        renders.append(r[:, :, :3].transpose(2, 0, 1))
        gts.append(g[:, :, :3].transpose(2, 0, 1))
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths):
    import jax.numpy as jnp

    from sgs_tpu.metrics.lpips import lpips, lpips_available
    from sgs_tpu.ops.ssim import psnr, ssim

    use_lpips = lpips_available()
    if not use_lpips:
        print("[metrics] LPIPS weights not found — reporting LPIPS as null")

    full_dict, per_view_dict = {}, {}
    for scene_dir in model_paths:
        print("Scene:", scene_dir)
        full_dict[scene_dir] = {}
        per_view_dict[scene_dir] = {}
        test_dir = Path(scene_dir) / "test"
        if not test_dir.is_dir():
            print(f"  no test dir in {scene_dir}")
            continue
        for method in os.listdir(test_dir):
            print("Method:", method)
            method_dir = test_dir / method
            renders, gts, names = read_images(
                method_dir / "renders", method_dir / "gt"
            )
            ssims, psnrs, lpipss = [], [], []
            for r, g in zip(renders, gts):
                rj, gj = jnp.asarray(r), jnp.asarray(g)
                ssims.append(float(ssim(rj, gj)))
                psnrs.append(float(psnr(rj, gj)))
                if use_lpips:
                    lpipss.append(float(lpips(rj, gj, net_type="vgg")[0]))
            print(f"  SSIM : {np.mean(ssims):>12.7f}")
            print(f"  PSNR : {np.mean(psnrs):>12.7f}")
            if use_lpips:
                print(f"  LPIPS: {np.mean(lpipss):>12.7f}")
            full_dict[scene_dir][method] = {
                "SSIM": float(np.mean(ssims)),
                "PSNR": float(np.mean(psnrs)),
                "LPIPS": float(np.mean(lpipss)) if use_lpips else None,
            }
            per_view_dict[scene_dir][method] = {
                "SSIM": dict(zip(names, map(float, ssims))),
                "PSNR": dict(zip(names, map(float, psnrs))),
                "LPIPS": dict(zip(names, map(float, lpipss))) if use_lpips else {},
            }
        with open(os.path.join(scene_dir, "results.json"), "w") as f:
            json.dump(full_dict[scene_dir], f, indent=True)
        with open(os.path.join(scene_dir, "per_view.json"), "w") as f:
            json.dump(per_view_dict[scene_dir], f, indent=True)


def main(argv=None):
    from sgs_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = ArgumentParser(description="Metrics script parameters")
    parser.add_argument("--model_paths", "-m", required=True, nargs="+", type=str)
    args = parser.parse_args(argv)
    evaluate(args.model_paths)


if __name__ == "__main__":
    main(sys.argv[1:])
