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


USAGE = ("usage: python scripts/eval_ply.py <point_cloud.ply> "
         "<dataset_dir> [sh_degree]")


def main():
    if len(sys.argv) < 3:
        print(USAGE, file=sys.stderr)
        raise SystemExit(1)
    ply_path, source = sys.argv[1], sys.argv[2]
    try:
        sh_degree = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    except ValueError:
        print(f"sh_degree must be an integer\n{USAGE}", file=sys.stderr)
        raise SystemExit(1)

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

    # bucket from a count pre-pass over EVERY test camera: a single-view
    # pre-pass can under-size the buckets for a denser view and silently
    # truncate (pipeline.py's overflow contract) — the max over all views
    # plus modest headroom guarantees exact renders for the whole split.
    from sgs_tpu.core.projection import project_gaussians
    from sgs_tpu.render.tiled import (
        instance_count_tight, kernel_row_count, row_count,
    )
    opac = pool.render_inputs(0).opacities[..., 0]

    @jax.jit
    def proj_one(cam):
        proj = project_gaussians(
            pool.xyz, pool.get_covariance(), cam.world_view_transform,
            cam.full_proj_transform, cam.tanfovx, cam.tanfovy, w, h,
        )
        valid = (proj["radius"] > 0) & pool.alive
        return proj, valid

    # pass 1: max level-1 row count across views → fixed max_rows
    rows = max(
        int(row_count(p["mean2d"], p["radius"], v, w, h))
        for p, v in (proj_one(lc.camera) for lc in cams)
    )
    max_rows = -(-int(rows * 1.2) // 4096) * 4096

    # pass 2: max tight instance count across views (fixed max_rows, so
    # this compiles once), then the kernel-row count at those buckets
    total = krows = 0
    for lc in cams:
        proj, valid = proj_one(lc.camera)
        total = max(total, int(instance_count_tight(
            proj["mean2d"], proj["conic"], opac, proj["depth"],
            proj["radius"], valid, w, h, max_rows,
        )))
    max_instances = -(-int(total * 1.2) // 4096) * 4096
    for lc in cams:
        proj, valid = proj_one(lc.camera)
        krows = max(krows, int(kernel_row_count(
            proj["mean2d"], proj["conic"], opac, proj["depth"],
            proj["radius"], valid, w, h, max_instances, max_rows,
        )))
    max_krows = -(-int(krows * 1.2) // 512) * 512

    @jax.jit
    def render_one(inputs, cam, bg):
        out = render(
            cam, inputs, bg, mode="tiled", backend="pallas",
            max_instances=max_instances, max_row_instances=max_rows,
            max_kernel_rows=max_krows,
        )
        return out["render"], out["overflow"]

    bg = jnp.zeros(3, jnp.float32)
    inputs = pool.render_inputs(sh_degree)
    psnrs = []
    overflowed = 0
    for lc in cams:
        img, ovf = render_one(inputs, lc.camera, bg)
        img = np.asarray(img)
        if int(ovf) != 0:
            overflowed += 1
            print(f"# WARNING: view overflowed {int(ovf)} instances — "
                  "PSNR for this view is unreliable", file=sys.stderr)
        gt = np.asarray(lc.gt_image)
        mse = float(np.mean((np.clip(img, 0, 1) - gt) ** 2))
        psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
        print(f"#   view psnr {psnrs[-1]:.2f}", file=sys.stderr)
    print(f"test_psnr_mean {np.mean(psnrs):.3f} views {len(psnrs)} "
          f"gaussians {n} overflowed_views {overflowed}")
    if overflowed:
        print(f"# {overflowed} view(s) overflowed — result is a lower "
              "bound, not an exact eval", file=sys.stderr)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
