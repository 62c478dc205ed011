#!/usr/bin/env python
"""Throughput-mode benchmark: N back-to-back fwd+bwd dispatches with ONE
block at the end. The tunnel TPU shows a time-varying ~30-40 ms
per-dispatch RPC floor that poisons per-call blocking timings; pipelined
dispatch (what a real training loop does) overlaps it with device work,
so wall/N here is the honest per-iteration cost.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_GAUSSIANS = 100_000
WIDTH, HEIGHT = 1920, 1080
REPS = 20


def main():
    import jax
    import jax.numpy as jnp

    from sgs_tpu.core.camera import Camera
    from sgs_tpu.core.projection import focal2fov, fov2focal
    from sgs_tpu.models.gaussians import GaussianPool
    from sgs_tpu.ops.ssim import l1_loss
    from sgs_tpu.render.pipeline import render
    from sgs_tpu.render import tiled

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

    max_instances = 1_548_288

    @jax.jit
    def fwd(p):
        out = render(
            cam, p.render_inputs(3), bg, mode="tiled",
            max_instances=max_instances, backend="pallas",
        )
        return out["render"]

    @jax.jit
    def fwd_bwd(p):
        def loss_fn(params):
            out = render(
                cam, p.with_params(params).render_inputs(3), bg,
                mode="tiled", max_instances=max_instances, backend="pallas",
            )
            return l1_loss(out["render"], gt)
        return jax.value_and_grad(loss_fn)(p.params())

    for name, fn in [("forward", fwd), ("fwd+bwd", fwd_bwd)]:
        r = fn(pool)
        jax.block_until_ready(r)
        # blocking per-call
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(pool))
            ts.append((time.perf_counter() - t0) * 1e3)
        # pipelined throughput
        t0 = time.perf_counter()
        rs = None
        for _ in range(REPS):
            rs = fn(pool)
        jax.block_until_ready(rs)
        per = (time.perf_counter() - t0) * 1e3 / REPS
        print(
            f"{name:10s} blocking {np.median(ts):8.2f} ms   "
            f"pipelined {per:8.2f} ms   ({1000.0/per:.2f} fps)"
        )


if __name__ == "__main__":
    main()
