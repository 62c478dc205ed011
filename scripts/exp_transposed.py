#!/usr/bin/env python
"""Transposed forward kernel: instances on SUBLANES, pixels on LANES.

The current kernel keeps per-pixel state as (256 pixels, 8 cols) — the
8-col lane dim uses 8/128 lanes, so every state op runs at ~6% VPU
width (ablation: 19 ms of 24 sit in the compositing block). Flipping
the layout puts pixels on lanes: state (8, 256) is full-width, instance
reductions are row ops, and the cumprod walks sublanes.

Variants: T_hs (Hillis-Steele via sublane shifts), T_mxu (tri-matmul).
Correctness: compared against the production forward_flat outputs.
"""

import functools
import sys
import os

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_transposed(mode="hs", krows=8):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sgs_tpu.core.projection import (
        ALPHA_MAX, ALPHA_MIN, TILE, TRANSMITTANCE_EPS,
    )
    from sgs_tpu.ops.pallas.flat_raster import CHUNK, REC, TILE_PIXELS

    _HI = jax.lax.Precision.HIGHEST
    SROWS = 8  # state rows: [r,g,b,t_run,t_final,last_contrib,0,0]

    def kernel(row_tile_ref, row_first_ref, meta_ref, packed_ref, out_ref, state):
        k = pl.program_id(0)
        tiles_x = meta_ref[0]
        num_tiles = meta_ref[1]
        # pixels on lanes: (1, 256) coordinate rows
        p_idx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIXELS), 1)
        lx = jax.lax.rem(p_idx, TILE).astype(jnp.float32)
        ly = (p_idx // TILE).astype(jnp.float32)
        # instance lane index on sublanes: (CHUNK, 1)
        lane_s = jax.lax.broadcasted_iota(
            jnp.int32, (CHUNK, 1), 0
        ).astype(jnp.float32)
        if mode == "mxu":
            si = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
            sj = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
            tri = (si >= sj).astype(jnp.float32)  # lower-tri: cumsum down rows

        for j in range(krows):
            r = k * krows + j
            t = row_tile_ref[r]
            px = (jax.lax.rem(t, tiles_x) * TILE).astype(jnp.float32) + lx
            py = ((t // tiles_x) * TILE).astype(jnp.float32) + ly

            @pl.when(row_first_ref[r] == 1)
            def _():
                state[0:3, :] = jnp.zeros((3, TILE_PIXELS), jnp.float32)
                state[3:5, :] = jnp.ones((2, TILE_PIXELS), jnp.float32)
                state[5:SROWS, :] = jnp.zeros(
                    (SROWS - 5, TILE_PIXELS), jnp.float32
                )

            t_row = state[3:4, :]  # (1, 256)

            @pl.when((t < num_tiles) & jnp.any(t_row >= TRANSMITTANCE_EPS))
            def _():
                rec = packed_ref[j * CHUNK:(j + 1) * CHUNK, :]  # (CHUNK, REC)
                mean_x = rec[:, 0:1]  # (CHUNK, 1)
                mean_y = rec[:, 1:2]
                ca = rec[:, 2:3]
                cb = rec[:, 3:4]
                cc = rec[:, 4:5]
                op = rec[:, 5:6]
                rgb_t = rec[:, 6:9]  # (CHUNK, 3)

                dx = mean_x - px  # (CHUNK, 256)
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
                            [
                                jnp.ones((kk, TILE_PIXELS), jnp.float32),
                                cp[:-kk, :],
                            ],
                            axis=0,
                        )
                        kk *= 2
                    cp_prev = jnp.concatenate(
                        [jnp.ones((1, TILE_PIXELS), jnp.float32), cp[:-1, :]],
                        axis=0,
                    )
                else:
                    z = jnp.log(jnp.maximum(u, 1e-30))
                    zc = jax.lax.dot_general(
                        tri, z, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=_HI,
                    )
                    cp = jnp.exp(zc)
                    cp_prev = jnp.exp(zc - z)
                s = t_row * cp  # (CHUNK, 256)
                include = (s >= TRANSMITTANCE_EPS) & (a > 0.0)
                w = jnp.where(include, t_row * cp_prev * a, 0.0)
                state[0:3, :] += jax.lax.dot_general(
                    rgb_t, w, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI,
                )  # (3, 256)
                tf_val = jnp.min(
                    jnp.where(include, s, 1.0), axis=0, keepdims=True
                )
                pos = (r * CHUNK).astype(jnp.float32) + lane_s + 1.0
                lastc_val = jnp.max(
                    jnp.where(include, pos, 0.0), axis=0, keepdims=True
                )
                state[4:5, :] = jnp.minimum(state[4:5, :], tf_val)
                state[5:6, :] = jnp.maximum(state[5:6, :], lastc_val)
                state[3:4, :] = s[CHUNK - 1: CHUNK, :]

            out_ref[j] = state[...]

    def forward(packed_t, row_tile, row_first, chunk_row_start, n_chunks,
                num_tiles, tiles_x):
        max_rows = packed_t.shape[0] // CHUNK
        grid = max_rows // krows
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(grid,),
            in_specs=[pl.BlockSpec((krows * CHUNK, REC), lambda k, *_: (k, 0))],
            out_specs=[
                pl.BlockSpec(
                    (krows, SROWS, TILE_PIXELS), lambda k, *_: (k, 0, 0)
                )
            ],
            scratch_shapes=[pltpu.VMEM((SROWS, TILE_PIXELS), jnp.float32)],
        )
        (rows_out,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(
                    (max_rows, SROWS, TILE_PIXELS), jnp.float32
                )
            ],
        )(row_tile, row_first, jnp.asarray([tiles_x, num_tiles], jnp.int32),
          packed_t)
        last_row = jnp.clip(chunk_row_start + n_chunks - 1, 0, max_rows - 1)
        final = rows_out[last_row]  # (T, SROWS, 256)
        empty = (n_chunks == 0)[:, None]
        colors = jnp.where(empty[:, None, :] * 0 + empty[:, None, :], 0.0,
                           final[:, 0:3, :])
        colors = jnp.where(empty[:, None, :], 0.0, final[:, 0:3, :])
        t_final = jnp.where(empty, 1.0, final[:, 4, :])
        last_contrib = jnp.where(empty, 0.0, final[:, 5, :])
        return colors, t_final, last_contrib

    return forward


def main():
    import jax
    import jax.numpy as jnp
    from dtime import device_ms
    from exp_fwd import build_inputs
    from sgs_tpu.ops.pallas import flat_raster as fr

    packed, row_tile, row_first, crs, nch, num_tiles, tiles_x = build_inputs()
    max_rows = packed.shape[0] // fr.REC
    # re-layout to (R*CHUNK, REC): instances on sublanes
    packed_t = (
        packed.reshape(max_rows, fr.REC, fr.CHUNK)
        .transpose(0, 2, 1)
        .reshape(max_rows * fr.CHUNK, fr.REC)
    )

    cur = jax.jit(functools.partial(
        fr.forward_flat, num_tiles=num_tiles, tiles_x=tiles_x
    ))
    ms, _ = device_ms(cur, (packed, row_tile, row_first, crs, nch))
    print(f"{'F_cur (production)':32s} {ms:9.3f} ms", flush=True)
    ref_c, ref_t, ref_l = cur(packed, row_tile, row_first, crs, nch)

    for mode, krows in [("hs", 8), ("mxu", 8)]:
        fwd = jax.jit(functools.partial(
            make_transposed(mode, krows), num_tiles=num_tiles, tiles_x=tiles_x
        ))
        ms, _ = device_ms(fwd, (packed_t, row_tile, row_first, crs, nch))
        print(f"{f'T_{mode} krows={krows}':32s} {ms:9.3f} ms", flush=True)
        c, t, l = fwd(packed_t, row_tile, row_first, crs, nch)
        c = c.transpose(0, 2, 1)  # (T,256,3)
        ec = float(jnp.max(jnp.abs(c - ref_c)))
        et = float(jnp.max(jnp.abs(t - ref_t)))
        el = float(jnp.max(jnp.abs(l - ref_l)))
        print(f"    max err vs production: color {ec:.2e} tf {et:.2e} lc {el:.2e}")


if __name__ == "__main__":
    main()
