#!/usr/bin/env python
"""5M-regime experiment: slab rendering vs single-pass (BASELINE
config 3, the garden-scale workload).

The scaling table (PERF_NOTES) shows per-instance cost GROWING 120 ->
322 ns from 100k -> 5M Gaussians: the instance-scale tables (sorted
arrays, attr tables, grad buffers) leave their fast gather/sort regimes.
Slab rendering splits the frame into K horizontal slabs rendered
sequentially IN ONE jit: per-slab tables are ~1/K the size, so every
instance-scale op runs in the fast regime, at the cost of K x the
N-scale prep (projection stays outside; the depth sort + ranked-record
builds inside the loop are identical across slabs when the slab shift
is applied at R-scale — XLA CSE merges them).

This measures the NAIVE slab loop (shifted mean2d per slab, no CSE
sharing) to bound the win before the invasive refactor: fwd+bwd ms at
N=5M for K in {1, 4, 8}.

Usage: exp_slab.py [N] [K1,K2,...]
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
KS = [int(k) for k in (sys.argv[2] if len(sys.argv) > 2 else "1,4,8").split(",")]
WIDTH, HEIGHT = 1920, 1080
ITERS = 3


def main():
    import jax
    import jax.numpy as jnp

    from sgs_tpu.core.camera import Camera
    from sgs_tpu.core.projection import (
        TILE, focal2fov, fov2focal, project_gaussians,
    )
    from sgs_tpu.models.gaussians import GaussianPool
    from sgs_tpu.render.tiled import (
        instance_count_tight, kernel_row_count, rasterize_tiled, row_count,
    )

    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(N, 3)) * 0.6).astype(np.float32)
    cols = rng.uniform(size=(N, 3)).astype(np.float32)
    pool = GaussianPool.from_pcd(
        pts, cols, 3, capacity=N,
        knn_dist2=np.full((N,), 1e-4, np.float32),
    )
    shrink = math.log((N / 100_000.0) ** (1.0 / 3.0))
    log_s = rng.uniform(-5.2 - shrink, -3.6 - shrink, (N, 3)).astype(np.float32)
    opac_logit = rng.uniform(-1.0, 4.0, (N, 1)).astype(np.float32)
    pool = pool.replace(
        scaling=pool.scaling.at[:].set(jnp.asarray(log_s)),
        opacity=pool.opacity.at[:].set(jnp.asarray(opac_logit)),
    )
    fovx = math.radians(60)
    fovy = focal2fov(fov2focal(fovx, WIDTH), HEIGHT)
    cam = Camera.from_Rt(
        np.eye(3), np.array([0.0, 0.0, 4.5]), fovx, fovy, WIDTH, HEIGHT
    )
    bg = jnp.zeros(3, jnp.float32)
    tiles_y = -(-HEIGHT // TILE)

    inputs = pool.render_inputs(0)
    proj = project_gaussians(
        pool.xyz, pool.get_covariance(), cam.world_view_transform,
        cam.full_proj_transform, cam.tanfovx, cam.tanfovy, WIDTH, HEIGHT,
    )
    proj = jax.tree.map(jax.block_until_ready, proj)
    valid = (proj["radius"] > 0) & pool.alive
    mean2d, conic = proj["mean2d"], proj["conic"]
    depth, radius = proj["depth"], proj["radius"]
    opac = inputs.opacities[..., 0]
    # flat rgb: SH degree-0 DC color (raster-only experiment; the SH eval
    # is part of the diffuse tail, measured separately)
    from sgs_tpu.core import sh as sh_lib
    rgb = jnp.asarray(sh_lib.sh_to_rgb_clamped(
        0, inputs.shs, jnp.zeros_like(pool.xyz)
    ))

    for k in KS:
        slab_ty = -(-tiles_y // k)
        bh = slab_ty * TILE
        # per-slab buckets: max over slabs of the count pre-passes
        rows = total = krows = 0
        shift = jnp.asarray([0.0, 1.0], jnp.float32)
        for s in range(k):
            m2 = mean2d - shift * float(s * bh)
            r = int(row_count(m2, radius, valid, WIDTH, bh))
            rows = max(rows, r)
        max_rows = -(-int(rows * 1.1) // 4096) * 4096
        for s in range(k):
            m2 = mean2d - shift * float(s * bh)
            t = int(instance_count_tight(
                m2, conic, opac, depth, radius, valid, WIDTH, bh, max_rows
            ))
            total = max(total, t)
        max_instances = -(-int(total * 1.1) // 4096) * 4096
        for s in range(k):
            m2 = mean2d - shift * float(s * bh)
            kr = int(kernel_row_count(
                m2, conic, opac, depth, radius, valid, WIDTH, bh,
                max_instances, max_rows,
            ))
            krows = max(krows, kr)
        max_krows = -(-int(krows * 1.1) // 512) * 512
        print(f"# K={k}: bucket inst {max_instances} rows {max_rows} "
              f"krows {max_krows}", file=sys.stderr, flush=True)

        @jax.jit
        def fwd_bwd(m2d, cn, rg, op):
            def loss(m2d, cn, rg, op):
                tot = 0.0
                for s in range(k):
                    m2 = m2d - shift * float(s * bh)
                    img, _ = rasterize_tiled(
                        m2, depth, cn, rg, op, radius, valid, bg,
                        WIDTH, bh, max_instances=max_instances,
                        backend="pallas", max_row_instances=max_rows,
                        max_kernel_rows=max_krows,
                    )
                    lo = s * bh
                    take = min(bh, HEIGHT - lo)
                    tot = tot + jnp.sum(jnp.abs(img[:, :take, :]))
                return tot / (3 * HEIGHT * WIDTH)

            return jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                m2d, cn, rg, op
            )

        r = fwd_bwd(mean2d, conic, rgb, opac)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            r = fwd_bwd(mean2d, conic, rgb, opac)
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"K={k} slabs: {ms:.1f} ms/frame fwd+bwd "
              f"({1e3 / ms:.2f} fps raster-only)", flush=True)


if __name__ == "__main__":
    main()
