#!/usr/bin/env python
"""Stage-by-stage profiler for the tiled rasterizer on real hardware.

The tunnel TPU shows large process-to-process variance, so every number
here is taken in ONE process with per-iteration blocking, alongside two
calibration ops (a 1.5M scalar gather and an argsort) that identify which
performance mode the process landed in. Run a few times; trust medians.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_GAUSSIANS = 100_000
WIDTH, HEIGHT = 1920, 1080
ITERS = 8


def bench(name, fn, *args, n=ITERS):
    import jax

    f = jax.jit(fn) if not hasattr(fn, "lower") else fn
    r = f(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name:46s} {np.median(ts):9.3f} ms   (min {min(ts):.3f})")
    return r


def main():
    import jax
    import jax.numpy as jnp

    from sgs_tpu.core.camera import Camera
    from sgs_tpu.core.projection import focal2fov, fov2focal, project_gaussians
    from sgs_tpu.core import transforms
    from sgs_tpu.core import sh as sh_lib
    from sgs_tpu.models.gaussians import GaussianPool
    from sgs_tpu.ops.ssim import l1_loss
    from sgs_tpu.render.pipeline import render
    from sgs_tpu.render import tiled
    from sgs_tpu.ops.pallas import flat_raster as fr

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

    # ---- calibration: which perf mode did this process land in? ----
    M = 1_548_288
    kk = jax.random.PRNGKey(0)
    perm = jax.random.permutation(kk, M).astype(jnp.int32)
    idx = jax.random.randint(kk, (M,), 0, M, dtype=jnp.int32)
    bench("CAL scalar gather M from (M,)", lambda p, i: p[i], perm, idx)
    bench("CAL argsort M", lambda p: jnp.argsort(p), perm)

    # ---- stage inputs ----
    inputs = pool.render_inputs(3)
    cov3d = transforms.build_covariance(inputs.scales, inputs.rotations, 1.0)

    def proj_fn(p):
        inp = p.render_inputs(3)
        cov = transforms.build_covariance(inp.scales, inp.rotations, 1.0)
        pr = project_gaussians(
            inp.means3d, cov, cam.world_view_transform,
            cam.full_proj_transform, cam.tanfovx, cam.tanfovy, WIDTH, HEIGHT,
        )
        dirs = inp.means3d - cam.camera_center[None, :]
        dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        rgb = sh_lib.sh_to_rgb_clamped(3, inp.shs, dirs)
        return pr["mean2d"], pr["depth"], pr["conic"], rgb, pr["radius"], inp.opacities[..., 0]

    mean2d, depth, conic, rgb, radius, opac = bench("projection+SH (fwd)", proj_fn, pool)
    valid = radius > 0

    total = int(tiled.instance_count(mean2d, radius, valid, WIDTH, HEIGHT))
    max_instances = -(-int(total * 1.25) // 4096) * 4096
    print(f"# instances {total} capacity {max_instances}")

    build = jax.jit(
        tiled._build_instances, static_argnums=(4, 5, 6)
    )
    tile_s, g_s, permi, overflow, num_tiles, tiles_x, tiles_y = bench(
        "binning (_build_instances)",
        lambda a, b, c, d: build(a, b, c, d, WIDTH, HEIGHT, max_instances),
        mean2d, depth, radius, valid,
    )
    num_tiles, tiles_x, tiles_y = int(num_tiles), int(tiles_x), int(tiles_y)

    max_rows = fr.num_rows(max_instances, num_tiles)
    attrf = jax.jit(tiled._attr_records)
    attr_sorted = bench(
        "attr records (_attr_records)", attrf,
        mean2d, conic, rgb, opac, permi, g_s,
    )
    packf = jax.jit(fr.pack_rows, static_argnums=(2, 3))
    packed, windows, row_tile, row_first, row_last, crs, nch, tstart, _ru = bench(
        "packing (pack_rows)",
        lambda *a: packf(*a, num_tiles, max_rows),
        attr_sorted, tile_s,
    )
    packed_t = jax.jit(jnp.transpose)(packed)

    fwd_kern = jax.jit(fr.forward_flat, static_argnums=(3, 4))
    colors, t_final, last_contrib = bench(
        "Pallas forward kernel (flat)",
        lambda *a: fwd_kern(*a, num_tiles, tiles_x),
        packed_t, crs, nch,
    )

    # full forward via public entry
    def fwd_full(p):
        out = render(
            cam, p.render_inputs(3), bg, mode="tiled",
            max_instances=max_instances, backend="pallas",
        )
        return out["render"]

    bench("FULL forward (render)", fwd_full, pool)

    # backward kernel standalone
    d_img = jnp.ones((3, HEIGHT, WIDTH), jnp.float32) / (3 * HEIGHT * WIDTH)
    dC = jax.jit(tiled._image_to_tiles_cf, static_argnums=(1, 2, 3, 4))(
        d_img, WIDTH, HEIGHT, tiles_x, tiles_y
    )
    safe_tile = jnp.minimum(row_tile, num_tiles - 1)
    aux_tiles = jnp.concatenate(
        [t_final[:, None, :], last_contrib[:, None, :], dC], axis=1
    )
    aux_rows = aux_tiles[safe_tile]
    bwd_kern = jax.jit(fr.backward_flat, static_argnums=(5, 6))
    grads_t = bench(
        "Pallas backward kernel (flat)",
        lambda *a: bwd_kern(*a, tiles_x, num_tiles),
        packed_t, crs, nch, bg, aux_rows,
    )
    padgrads = (
        jax.jit(jnp.transpose)(grads_t[0:8]),
        jax.jit(jnp.transpose)(grads_t[8:16]),
    )
    bench(
        "grad reduction (reduce_grads, rect-path)",
        lambda *a: jax.jit(fr.reduce_grads, static_argnums=2)(*a, N_GAUSSIANS),
        padgrads, windows,
    )

    # full loss fwd+bwd
    @jax.jit
    def fwd_bwd(p):
        def loss_fn(params):
            out = render(
                cam, p.with_params(params).render_inputs(3), bg,
                mode="tiled", max_instances=max_instances, backend="pallas",
            )
            return l1_loss(out["render"], gt)
        return jax.value_and_grad(loss_fn)(p.params())

    bench("FULL fwd+bwd (loss+grads)", fwd_bwd, pool)
    bench("CAL scalar gather M (repeat)", lambda p, i: p[i], perm, idx)


if __name__ == "__main__":
    main()
