#!/usr/bin/env python
"""Evaluate a trained PLY snapshot's test-split PSNR on the TPU.

Covers the gap between the trainer's periodic test evals: when a run is
stopped between test_iterations, the latest point_cloud snapshot has no
PSNR row in losses.tsv — this loads the PLY + the dataset's test split
and reports mean PSNR (same camera path / renderer as the trainer's
training_report; reference protocol: /root/reference/full_eval.py
render->metrics chain).

Usage: python scripts/eval_ply.py <point_cloud.ply> <dataset_dir> [sh_degree]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ply_path, source = sys.argv[1], sys.argv[2]
    sh_degree = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sgs_tpu.data.ply import load_gaussian_ply
    from sgs_tpu.data.scene import Scene, pool_from_arrays
    from sgs_tpu.render.pipeline import render
    from sgs_tpu.utils.config import ModelParams

    arrays = load_gaussian_ply(ply_path, sh_degree)
    n = arrays["xyz"].shape[0]
    pool = pool_from_arrays(arrays, sh_degree, capacity=-(-n // 4096) * 4096)
    print(f"# {n} gaussians from {ply_path}", file=sys.stderr)

    args = ModelParams(source_path=source, sh_degree=sh_degree, eval=True)
    scene = Scene(args, load_iteration=None, shuffle=False)
    cams = scene.getTestCameras()
    w, h = cams[0].camera.image_width, cams[0].camera.image_height

    # bucket from a count pre-pass over the first camera (fixed scene)
    from sgs_tpu.core.projection import project_gaussians
    from sgs_tpu.render.tiled import (
        instance_count_tight, kernel_row_count, row_count,
    )
    cam0 = cams[0].camera
    proj = project_gaussians(
        pool.xyz, pool.get_covariance(), cam0.world_view_transform,
        cam0.full_proj_transform, cam0.tanfovx, cam0.tanfovy, w, h,
    )
    valid = (proj["radius"] > 0) & pool.alive
    opac = pool.render_inputs(0).opacities[..., 0]
    rows = int(row_count(proj["mean2d"], proj["radius"], valid, w, h))
    max_rows = -(-int(rows * 1.6) // 4096) * 4096
    total = int(instance_count_tight(
        proj["mean2d"], proj["conic"], opac, proj["depth"], proj["radius"],
        valid, w, h, max_rows,
    ))
    max_instances = -(-int(total * 1.6) // 4096) * 4096
    krows = int(kernel_row_count(
        proj["mean2d"], proj["conic"], opac, proj["depth"], proj["radius"],
        valid, w, h, max_instances, max_rows,
    ))
    max_krows = -(-int(krows * 1.5) // 512) * 512

    @jax.jit
    def render_one(inputs, cam, bg):
        out = render(
            cam, inputs, bg, mode="tiled", backend="pallas",
            max_instances=max_instances, max_row_instances=max_rows,
            max_kernel_rows=max_krows,
        )
        return out["render"]

    bg = jnp.zeros(3, jnp.float32)
    inputs = pool.render_inputs(sh_degree)
    psnrs = []
    for lc in cams:
        img = np.asarray(render_one(inputs, lc.camera, bg))
        gt = np.asarray(lc.gt_image)
        mse = float(np.mean((np.clip(img, 0, 1) - gt) ** 2))
        psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
        print(f"#   view psnr {psnrs[-1]:.2f}", file=sys.stderr)
    print(f"test_psnr_mean {np.mean(psnrs):.3f} views {len(psnrs)} "
          f"gaussians {n}")


if __name__ == "__main__":
    main()
