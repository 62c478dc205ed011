#!/usr/bin/env python
"""Experiment: forward kernel variants on realistic 1080p/100k inputs.

F_cur:  current forward_flat (KROWS=8, Hillis-Steele lane-shift cumprod)
F_kN:   same math, KROWS=N (grid-step fixed-cost share)
F_mxu:  log-space cumsum via lower-triangular MXU contraction
F_nocp: ablation — no cumprod at all (WRONG math; isolates its cost)
"""

import functools
import math
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_GAUSSIANS = 100_000
WIDTH, HEIGHT = 1920, 1080


def build_inputs():
    import jax.numpy as jnp

    from sgs_tpu.core.camera import Camera
    from sgs_tpu.core import sh as sh_lib
    from sgs_tpu.core import transforms
    from sgs_tpu.core.projection import focal2fov, fov2focal, project_gaussians
    from sgs_tpu.models.gaussians import GaussianPool
    from sgs_tpu.render import tiled
    from sgs_tpu.ops.pallas import flat_raster as fr
    import jax

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
    inp = pool.render_inputs(3)
    cov = transforms.build_covariance(inp.scales, inp.rotations, 1.0)
    proj = project_gaussians(
        inp.means3d, cov, cam.world_view_transform,
        cam.full_proj_transform, cam.tanfovx, cam.tanfovy, WIDTH, HEIGHT,
    )
    dirs = inp.means3d - cam.camera_center[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    rgb = sh_lib.sh_to_rgb_clamped(3, inp.shs, dirs)
    mean2d, depth, conic, radius = (
        proj["mean2d"], proj["depth"], proj["conic"], proj["radius"],
    )
    opac = inp.opacities[..., 0]
    valid = radius > 0
    total = int(tiled.instance_count(mean2d, radius, valid, WIDTH, HEIGHT))
    max_instances = 1_548_288
    build = jax.jit(tiled._build_instances, static_argnums=(4, 5, 6))
    tile_s, gi_s, order, overflow, num_tiles, tiles_x, tiles_y = build(
        mean2d, depth, radius, valid, WIDTH, HEIGHT, max_instances
    )
    num_tiles, tiles_x = int(num_tiles), int(tiles_x)
    attr_sorted = jax.jit(tiled._attr_records)(
        mean2d, conic, rgb, opac, order, gi_s
    )
    max_rows = fr.num_rows(max_instances, num_tiles)
    packed, windows, row_tile, row_first, row_last, crs, nch, *_ = jax.jit(
        fr.pack_rows, static_argnums=(2, 3)
    )(attr_sorted, tile_s, num_tiles, max_rows)
    return packed, row_tile, row_first, crs, nch, num_tiles, tiles_x


def make_variant(krows, mode):
    """Local copy of the forward kernel with (krows, cumprod-mode) knobs."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sgs_tpu.core.projection import ALPHA_MAX, ALPHA_MIN, TILE, TRANSMITTANCE_EPS
    from sgs_tpu.ops.pallas.flat_raster import CHUNK, OUT_COLS, REC, TILE_PIXELS

    _HI = jax.lax.Precision.HIGHEST

    def kernel(row_tile_ref, row_first_ref, meta_ref, packed_ref, out_ref, state):
        k = pl.program_id(0)
        tiles_x = meta_ref[0]
        num_tiles = meta_ref[1]
        p_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIXELS, CHUNK), 0)
        lane_f = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_PIXELS, CHUNK), 1
        ).astype(jnp.float32)
        lx = jax.lax.rem(p_idx, TILE).astype(jnp.float32)
        ly = (p_idx // TILE).astype(jnp.float32)
        if mode == "mxu":
            li = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
            lj = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
            tri = (li <= lj).astype(jnp.float32)  # upper-tri: cumsum along lanes

        for j in range(krows):
            r = k * krows + j
            t = row_tile_ref[r]
            px = (jax.lax.rem(t, tiles_x) * TILE).astype(jnp.float32) + lx
            py = ((t // tiles_x) * TILE).astype(jnp.float32) + ly

            @pl.when(row_first_ref[r] == 1)
            def _():
                state[:, 0:3] = jnp.zeros((TILE_PIXELS, 3), jnp.float32)
                state[:, 3:6] = jnp.concatenate(
                    [
                        jnp.ones((TILE_PIXELS, 2), jnp.float32),
                        jnp.zeros((TILE_PIXELS, 1), jnp.float32),
                    ],
                    axis=1,
                )

            t_row = state[:, 3:4]

            @pl.when((t < num_tiles) & jnp.any(t_row >= TRANSMITTANCE_EPS))
            def _():
                rec = packed_ref[j * REC:(j + 1) * REC, :]
                mean_x = rec[0:1, :]
                mean_y = rec[1:2, :]
                ca = rec[2:3, :]
                cb = rec[3:4, :]
                cc = rec[4:5, :]
                op = rec[5:6, :]
                rgb_t = rec[6:9, :]

                dx = mean_x - px
                dy = mean_y - py
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
                a = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
                u = 1.0 - a
                if mode == "hs":
                    cp = u
                    kk = 1
                    while kk < CHUNK:
                        cp = cp * jnp.concatenate(
                            [jnp.ones((TILE_PIXELS, kk), jnp.float32), cp[:, :-kk]],
                            axis=1,
                        )
                        kk *= 2
                    cp_prev = jnp.concatenate(
                        [jnp.ones((TILE_PIXELS, 1), jnp.float32), cp[:, :-1]],
                        axis=1,
                    )
                elif mode == "mxu":
                    z = jnp.log(jnp.maximum(u, 1e-30))
                    zc = jax.lax.dot_general(
                        z, tri, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=_HI,
                    )
                    cp = jnp.exp(zc)
                    cp_prev = jnp.exp(zc - z)
                else:  # nocp ablation (wrong math)
                    cp = u
                    cp_prev = u
                s = t_row * cp
                include = (s >= TRANSMITTANCE_EPS) & (a > 0.0)
                w = jnp.where(include, t_row * cp_prev * a, 0.0)
                state[:, 0:3] += jax.lax.dot_general(
                    w, rgb_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI,
                )
                tf_val = jnp.min(jnp.where(include, s, 1.0), axis=1, keepdims=True)
                pos = (r * CHUNK).astype(jnp.float32) + lane_f + 1.0
                lastc_val = jnp.max(
                    jnp.where(include, pos, 0.0), axis=1, keepdims=True
                )
                state[:, 4:6] = jnp.concatenate(
                    [
                        jnp.minimum(state[:, 4:5], tf_val),
                        jnp.maximum(state[:, 5:6], lastc_val),
                    ],
                    axis=1,
                )
                state[:, 3:4] = s[:, CHUNK - 1: CHUNK]

            out_ref[j] = state[...]

    def forward(packed, row_tile, row_first, chunk_row_start, n_chunks,
                num_tiles, tiles_x):
        max_rows = packed.shape[0] // REC
        grid = max_rows // krows
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(grid,),
            in_specs=[pl.BlockSpec((krows * REC, CHUNK), lambda k, *_: (k, 0))],
            out_specs=[
                pl.BlockSpec(
                    (krows, TILE_PIXELS, OUT_COLS), lambda k, *_: (k, 0, 0)
                )
            ],
            scratch_shapes=[pltpu.VMEM((TILE_PIXELS, OUT_COLS), jnp.float32)],
        )
        (rows_out,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((max_rows, TILE_PIXELS, OUT_COLS), jnp.float32)
            ],
        )(row_tile, row_first, jnp.asarray([tiles_x, num_tiles], jnp.int32), packed)
        last_row = jnp.clip(chunk_row_start + n_chunks - 1, 0, max_rows - 1)
        final = rows_out[last_row]
        return final

    return forward


def main():
    import jax
    import jax.numpy as jnp
    from dtime import device_ms
    from sgs_tpu.ops.pallas import flat_raster as fr

    packed, row_tile, row_first, crs, nch, num_tiles, tiles_x = build_inputs()
    max_rows = packed.shape[0] // fr.REC
    print(f"max_rows={max_rows} num_tiles={num_tiles}")

    cur = jax.jit(functools.partial(
        fr.forward_flat, num_tiles=num_tiles, tiles_x=tiles_x
    ))
    ms, _ = device_ms(cur, (packed, row_tile, row_first, crs, nch))
    print(f"{'F_cur (KROWS=8, HS)':36s} {ms:9.3f} ms", flush=True)
    ref = cur(packed, row_tile, row_first, crs, nch)

    for krows, mode in [(8, "hs"), (32, "hs"), (8, "mxu"), (32, "mxu"), (32, "nocp")]:
        if max_rows % krows:
            print(f"skip krows={krows} (rows not divisible)")
            continue
        fwd = jax.jit(functools.partial(
            make_variant(krows, mode), num_tiles=num_tiles, tiles_x=tiles_x
        ))
        ms, _ = device_ms(fwd, (packed, row_tile, row_first, crs, nch))
        print(f"{f'F krows={krows} mode={mode}':36s} {ms:9.3f} ms", flush=True)
        if mode != "nocp":
            out = fwd(packed, row_tile, row_first, crs, nch)
            err_c = float(jnp.max(jnp.abs(out[:, :, 0:3] - ref[0])))
            err_t = float(jnp.max(jnp.abs(out[:, :, 4] - ref[1])))
            err_l = float(jnp.max(jnp.abs(out[:, :, 5] - ref[2])))
            print(f"    max err: color {err_c:.2e} t_final {err_t:.2e} lastc {err_l:.2e}")


if __name__ == "__main__":
    main()
