#!/usr/bin/env python
"""Forward kernel structural ablations: where do 21 ms of floor cost sit?

A_empty:   kernel body entirely empty (block pipeline cost only)
A_outonly: only out_ref[j] = state copy per row (adds output VMEM copies)
A_alpha:   alpha eval per row, single-col reduce written (adds VPU math)
A_narrow:  full current math but OUT_COLS=8 -> writes only when row_last
           (state kept in scratch; out written per row regardless - same
           as current; kept for sanity)
"""

import functools
import sys
import os

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from exp_fwd import build_inputs


def make_ablation(mode, krows=8, out_cols=8):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sgs_tpu.core.projection import ALPHA_MAX, ALPHA_MIN, TILE
    from sgs_tpu.ops.pallas.flat_raster import CHUNK, REC, TILE_PIXELS

    def kernel(row_tile_ref, row_first_ref, meta_ref, packed_ref, out_ref, state):
        k = pl.program_id(0)
        tiles_x = meta_ref[0]
        num_tiles = meta_ref[1]
        p_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIXELS, CHUNK), 0)
        lx = jax.lax.rem(p_idx, TILE).astype(jnp.float32)
        ly = (p_idx // TILE).astype(jnp.float32)

        if mode == "empty":
            return
        for j in range(krows):
            r = k * krows + j
            t = row_tile_ref[r]
            if mode == "outonly":
                out_ref[j] = state[...]
                continue
            px = (jax.lax.rem(t, tiles_x) * TILE).astype(jnp.float32) + lx
            py = ((t // tiles_x) * TILE).astype(jnp.float32) + ly

            @pl.when(t < num_tiles)
            def _():
                rec = packed_ref[j * REC:(j + 1) * REC, :]
                mean_x = rec[0:1, :]
                mean_y = rec[1:2, :]
                ca = rec[2:3, :]
                cb = rec[3:4, :]
                cc = rec[4:5, :]
                op = rec[5:6, :]
                dx = mean_x - px
                dy = mean_y - py
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
                a = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
                state[:, 0:1] += jnp.sum(a, axis=1, keepdims=True)

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
                    (krows, TILE_PIXELS, out_cols), lambda k, *_: (k, 0, 0)
                )
            ],
            scratch_shapes=[pltpu.VMEM((TILE_PIXELS, out_cols), jnp.float32)],
        )
        (rows_out,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((max_rows, TILE_PIXELS, out_cols), jnp.float32)
            ],
        )(row_tile, row_first, jnp.asarray([tiles_x, num_tiles], jnp.int32), packed)
        return rows_out[0]

    return forward


def main():
    import jax
    from dtime import device_ms

    packed, row_tile, row_first, crs, nch, num_tiles, tiles_x = build_inputs()
    for mode, krows, oc in [
        ("empty", 8, 8),
        ("outonly", 8, 8),
        ("alpha", 8, 8),
        ("alpha", 8, 1),
        ("alpha", 32, 1),
    ]:
        fwd = jax.jit(functools.partial(
            make_ablation(mode, krows, oc), num_tiles=num_tiles, tiles_x=tiles_x
        ))
        ms, _ = device_ms(fwd, (packed, row_tile, row_first, crs, nch))
        print(f"A_{mode} krows={krows} out_cols={oc}: {ms:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
