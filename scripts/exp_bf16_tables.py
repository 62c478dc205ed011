#!/usr/bin/env python
"""Measure what bf16-narrowed gather tables WOULD cost in accuracy.

VERDICT r5 task 3b asked for bf16-narrowed gather tables (attr payload +
grad buffers) gated on the 3e-5 image / grad parity bar, with the
instruction "if parity breaks, record the measured error and stop".
Analysis says it must break: the kernel computes d = (px - mx) with mx
up to 1920 px (bf16 abs error up to ~4 px) and alpha = op*exp(-0.5 q)
with q up to ~5.5 (bf16 rel error 0.4% on conic -> ~1% alpha error).
This script records the actual numbers via render/tiled.PAYLOAD_BF16_SIM
(an accuracy probe that rounds the ranked attr payload, the cull record,
and the per-slot gradient records through bf16 while keeping id lanes
exact, as a real layout would via a separate i32 gather).

Usage: python scripts/exp_bf16_tables.py [n_gaussians] [size]
Prints one JSON line per (path, rounding) combination:
  image max/mean abs err, grad max relative err per param group.
CPU-safe (XLA path semantics identical; the probe is pure numerics).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 800

    import jax
    import jax.numpy as jnp

    from sgs_tpu.core.camera import Camera
    from sgs_tpu.core.projection import focal2fov, fov2focal
    from sgs_tpu.models.gaussians import GaussianPool
    from sgs_tpu.ops.ssim import l1_loss
    from sgs_tpu.render.pipeline import render
    import sgs_tpu.render.tiled as tiled
    import math

    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(n, 3)) * 0.6).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    pool = GaussianPool.from_pcd(
        pts, cols, 3, capacity=n,
        knn_dist2=np.full((n,), 1e-4, np.float32),
    )
    log_s = rng.uniform(-5.2, -3.6, (n, 3)).astype(np.float32)
    opac = rng.uniform(-1.0, 4.0, (n, 1)).astype(np.float32)
    pool = pool.replace(
        scaling=pool.scaling.at[:].set(jnp.asarray(log_s)),
        opacity=pool.opacity.at[:].set(jnp.asarray(opac)),
    )
    fovx = math.radians(60)
    fovy = focal2fov(fov2focal(fovx, size), size)
    cam = Camera.from_Rt(
        np.eye(3), np.array([0.0, 0.0, 4.5]), fovx, fovy, size, size
    )
    gt = jnp.zeros((3, size, size), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    from sgs_tpu.core.projection import project_gaussians
    from sgs_tpu.render.tiled import (
        instance_count_tight, kernel_row_count, row_count,
    )

    proj = project_gaussians(
        pool.xyz, pool.get_covariance(), cam.world_view_transform,
        cam.full_proj_transform, cam.tanfovx, cam.tanfovy, size, size,
    )
    valid = (proj["radius"] > 0) & pool.alive
    inputs = pool.render_inputs(0)
    rows = int(row_count(proj["mean2d"], proj["radius"], valid, size, size))
    max_rows = -(-int(rows * 1.25) // 4096) * 4096
    total = int(instance_count_tight(
        proj["mean2d"], proj["conic"], inputs.opacities[..., 0],
        proj["depth"], proj["radius"], valid, size, size, max_rows,
    ))
    max_instances = -(-int(total * 1.25) // 4096) * 4096
    krows = int(kernel_row_count(
        proj["mean2d"], proj["conic"], inputs.opacities[..., 0],
        proj["depth"], proj["radius"], valid, size, size,
        max_instances, max_rows,
    ))
    max_krows = -(-int(krows * 1.15) // 512) * 512

    def fwd_bwd(p):
        def loss_fn(params):
            out = render(
                cam, p.with_params(params).render_inputs(3), bg,
                mode="tiled", max_instances=max_instances,
                backend="pallas", max_row_instances=max_rows,
                max_kernel_rows=max_krows,
            )
            return l1_loss(out["render"], gt), out["render"]

        (_, img), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p.params())
        return img, grads

    for path, max_rows_cap in (("two_gather", 768 * 1024),
                               ("merged_payload", 0)):
        tiled.TWO_GATHER_MAX_ROWS = max_rows_cap
        refs = {}
        for rounded in (False, True):
            tiled.PAYLOAD_BF16_SIM = rounded
            jax.clear_caches()  # flag is baked at trace time
            img, grads = jax.block_until_ready(jax.jit(fwd_bwd)(pool))
            if not rounded:
                refs = {"img": np.asarray(img),
                        "grads": {k: np.asarray(g)
                                  for k, g in grads.items()}}
                continue
            d_img = np.abs(np.asarray(img) - refs["img"])
            rec = {
                "path": path,
                "img_max_abs_err": float(d_img.max()),
                "img_mean_abs_err": float(d_img.mean()),
            }
            for name, g in grads.items():
                g0 = refs["grads"][name]
                scale = np.abs(g0).max() + 1e-30
                rec[f"grad_{name}_max_rel"] = float(
                    np.abs(np.asarray(g) - g0).max() / scale
                )
            print(json.dumps(rec), flush=True)
        tiled.PAYLOAD_BF16_SIM = False
    tiled.TWO_GATHER_MAX_ROWS = 768 * 1024


if __name__ == "__main__":
    main()
