#!/usr/bin/env python
"""Measure fwd+bwd frame time vs the kernel CHUNK/KROWS constants.

Padding is one-chunk-roundup per tile (8160 tiles at 1080p): at
CHUNK=128 with ~815k tight instances the padded slot count is ~2.06M —
60% padding. Smaller chunks cut padding (and every slot-proportional
cost: kernels, scatter-add, pack gather) at the price of more per-row
fixed work. One config per process (module constants are baked at trace
time): scripts/exp_chunk.py CHUNK KROWS
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_GAUSSIANS = 100_000
WIDTH, HEIGHT = 1920, 1080


def main():
    chunk = int(sys.argv[1])
    krows = int(sys.argv[2])
    from sgs_tpu.ops.pallas import flat_raster as fr

    fr.CHUNK = chunk
    fr.KROWS = krows

    import jax
    import jax.numpy as jnp

    from sgs_tpu.core.camera import Camera
    from sgs_tpu.core.projection import focal2fov, fov2focal, project_gaussians
    from sgs_tpu.models.gaussians import GaussianPool
    from sgs_tpu.ops.ssim import l1_loss
    from sgs_tpu.render.pipeline import render
    from sgs_tpu.render.tiled import instance_count_tight, row_count

    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(N_GAUSSIANS, 3)) * 0.6).astype(np.float32)
    cols = rng.uniform(size=(N_GAUSSIANS, 3)).astype(np.float32)
    pool = GaussianPool.from_pcd(
        pts, cols, 3, capacity=N_GAUSSIANS,
        knn_dist2=np.full((N_GAUSSIANS,), 1e-4, np.float32),
    )
    log_s = rng.uniform(-5.2, -3.6, (N_GAUSSIANS, 3)).astype(np.float32)
    opac_logit = rng.uniform(-1.0, 4.0, (N_GAUSSIANS, 1)).astype(np.float32)
    pool = pool.replace(
        scaling=pool.scaling.at[:].set(jnp.asarray(log_s)),
        opacity=pool.opacity.at[:].set(jnp.asarray(opac_logit)),
    )
    fovx = math.radians(60)
    fovy = focal2fov(fov2focal(fovx, WIDTH), HEIGHT)
    cam = Camera.from_Rt(
        np.eye(3), np.array([0.0, 0.0, 4.5]), fovx, fovy, WIDTH, HEIGHT
    )
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    max_instances = 1_019_904
    max_rows = 425_984

    @jax.jit
    def fwd_bwd(p):
        def loss_fn(params):
            out = render(
                cam, p.with_params(params).render_inputs(3), bg,
                mode="tiled", max_instances=max_instances, backend="pallas",
                max_row_instances=max_rows,
            )
            return l1_loss(out["render"], gt)
        return jax.value_and_grad(loss_fn)(p.params())

    r = fwd_bwd(pool)
    jax.block_until_ready(r)
    jax.block_until_ready(fwd_bwd(pool))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd_bwd(pool))
        ts.append((time.perf_counter() - t0) * 1e3)
    slots = fr.num_rows(max_instances, 8160) * chunk
    print(
        f"CHUNK={chunk} KROWS={krows} slots={slots} "
        f"median={sorted(ts)[len(ts)//2]:.1f} ms min={min(ts):.1f}"
    )


if __name__ == "__main__":
    main()
