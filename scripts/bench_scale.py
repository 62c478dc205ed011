#!/usr/bin/env python
"""Scaling benchmark: fwd+bwd frame time at 1080p vs Gaussian count.

BASELINE.md's target config is garden @1080p with ~5M Gaussians; this
sweeps the pool size with converged-model statistics (splat screen
footprint shrinking as N grows, matching how densification trades splat
size for count) and reports instances, frame time, and fps per config.

Usage: python scripts/bench_scale.py [--capture] [N ...]  (default sweep)
Prints one JSON line per config.

--capture shifts the camera sideways at the same viewing distance (a
panning capture view): ~half the pool lands outside the frustum, and
the run sizes a max_visible bucket (render/tiled.visible_count) so the
binning pays visible count, not pool capacity. The default all-visible
geometry is the worst case. (A camera INSIDE the cloud is a HARDER
workload, not easier — see PERF_NOTES.)
"""

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

WIDTH, HEIGHT = 1920, 1080
ITERS = 4


def run_config(n_gaussians: int, capture: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from sgs_tpu.core.camera import Camera
    from sgs_tpu.core.projection import focal2fov, fov2focal, project_gaussians
    from sgs_tpu.models.gaussians import GaussianPool
    from sgs_tpu.ops.ssim import l1_loss
    from sgs_tpu.render.pipeline import render
    from sgs_tpu.render.tiled import (
        instance_count_tight,
        kernel_row_count,
        row_count,
    )

    rng = np.random.default_rng(0)
    # Converged-capture statistics: scene extent fixed (~2 units), splat
    # linear size ~ N^(-1/3) so total covered area stays constant as the
    # pool densifies (the 3DGS clone/split invariant).
    pts = (rng.normal(size=(n_gaussians, 3)) * 0.6).astype(np.float32)
    cols = rng.uniform(size=(n_gaussians, 3)).astype(np.float32)
    pool = GaussianPool.from_pcd(
        pts, cols, 3, capacity=n_gaussians,
        knn_dist2=np.full((n_gaussians,), 1e-4, np.float32),
    )
    shrink = math.log((n_gaussians / 100_000.0) ** (1.0 / 3.0))
    log_s = rng.uniform(-5.2 - shrink, -3.6 - shrink, (n_gaussians, 3)).astype(
        np.float32
    )
    opac_logit = rng.uniform(-1.0, 4.0, (n_gaussians, 1)).astype(np.float32)
    pool = pool.replace(
        scaling=pool.scaling.at[:].set(jnp.asarray(log_s)),
        opacity=pool.opacity.at[:].set(jnp.asarray(opac_logit)),
    )

    fovx = math.radians(60)
    fovy = focal2fov(fov2focal(fovx, WIDTH), HEIGHT)
    if capture:
        # same viewing DISTANCE as the default (so per-splat footprint
        # statistics are unchanged) but shifted sideways: ~half the
        # cloud leaves the frustum, like a panning capture view. (A
        # camera INSIDE the cloud was tried first and is a HARDER
        # workload, not an easier one: nearby splats grow to huge
        # footprints and the instance count rises 10% despite 27%
        # visibility — see PERF_NOTES.)
        cam = Camera.from_Rt(
            np.eye(3), np.array([2.5, 0.0, 4.5]), fovx, fovy, WIDTH, HEIGHT
        )
    else:
        cam = Camera.from_Rt(
            np.eye(3), np.array([0.0, 0.0, 4.5]), fovx, fovy, WIDTH, HEIGHT
        )
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)

    proj = project_gaussians(
        pool.xyz, pool.get_covariance(), cam.world_view_transform,
        cam.full_proj_transform, cam.tanfovx, cam.tanfovy, WIDTH, HEIGHT,
    )
    valid = (proj["radius"] > 0) & pool.alive
    n_vis = int(jnp.sum(valid))
    # compaction only pays when the frustum actually culls; at ~full
    # visibility the scatter is pure overhead (--no_vis disables for
    # A/B differential runs)
    if n_vis < 0.9 * n_gaussians and "--no_vis" not in sys.argv:
        max_visible = -(-int(n_vis * 1.25) // 4096) * 4096
    else:
        max_visible = 0
    rows = int(
        row_count(proj["mean2d"], proj["radius"], valid, WIDTH, HEIGHT)
    )
    max_rows = -(-int(rows * 1.25) // 4096) * 4096
    inputs = pool.render_inputs(0)
    total = int(
        instance_count_tight(
            proj["mean2d"], proj["conic"], inputs.opacities[..., 0],
            proj["depth"], proj["radius"], valid, WIDTH, HEIGHT, max_rows,
        )
    )
    max_instances = -(-int(total * 1.25) // 4096) * 4096
    krows = int(
        kernel_row_count(
            proj["mean2d"], proj["conic"], inputs.opacities[..., 0],
            proj["depth"], proj["radius"], valid, WIDTH, HEIGHT,
            max_instances, max_rows,
        )
    )
    max_krows = -(-int(krows * 1.15) // 512) * 512

    @jax.jit
    def fwd_bwd(p):
        def loss_fn(params):
            out = render(
                cam, p.with_params(params).render_inputs(3), bg,
                mode="tiled", max_instances=max_instances, backend="pallas",
                max_row_instances=max_rows, max_kernel_rows=max_krows,
                max_visible=max_visible,
            )
            return l1_loss(out["render"], gt)

        loss, grads = jax.value_and_grad(loss_fn)(p.params())
        return loss, grads

    t0 = time.perf_counter()
    jax.block_until_ready(fwd_bwd(pool))
    compile_s = time.perf_counter() - t0
    jax.block_until_ready(fwd_bwd(pool))  # warmup

    t0 = time.perf_counter()
    if n_gaussians >= 1_000_000:
        # frames are 100s of ms here: tunnel RPC latency is noise, and
        # enqueueing all iterations keeps ITERS copies of the 1 GB-scale
        # gradient outputs alive (runtime OOM at 5M)
        for _ in range(ITERS):
            jax.block_until_ready(fwd_bwd(pool))
    else:
        outs = [fwd_bwd(pool) for _ in range(ITERS)]
        jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / ITERS

    return {
        "n_gaussians": n_gaussians,
        "visible": n_vis,
        "max_visible": max_visible,
        "instances": total,
        "rows": rows,
        "capacity": max_instances,
        "fwd_bwd_ms": round(dt * 1e3, 2),
        "fps": round(1.0 / dt, 3),
        "compile_s": round(compile_s, 1),
        "capture": capture,
    }


def main():
    args = sys.argv[1:]
    capture = "--capture" in args
    args = [a for a in args if a not in ("--capture", "--no_vis")]
    ns = [int(float(a)) for a in args] or [
        100_000, 500_000, 1_000_000, 2_000_000, 5_000_000
    ]
    for n in ns:
        r = run_config(n, capture=capture)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
