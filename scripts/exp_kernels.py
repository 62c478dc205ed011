#!/usr/bin/env python
"""Kernel-only micro-bench: forward_flat / backward_flat device time vs
(CHUNK, KROWS) at bench-scale shapes (1080p, ~820k tight instances).

Round 3 chose CHUNK=64 when the slots-scale PACK GATHER still existed
(64 cut its padding 1.70M -> 1.31M slots for +0.9 ms kernel fixed cost).
The sort-aligned packer then removed that gather entirely, which moves
the optimum: per-row fixed cost (DMA orchestration + row lookup + @when
dispatch) is now a large share of kernel time, so fewer/wider rows may
win back several ms. This isolates the two kernels from the pipeline to
measure exactly that tradeoff.

The fake layout is realistic: T tiles with a lognormal-ish row count
distribution, all rows LIVE (t_final moderate, last_contrib = end), so
no saturation skips flatter the comparison.

Usage: exp_kernels.py [chunk,krows ...]  (default: 64,8 64,16 128,8 128,16)
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

TILES_X, TILES_Y = 120, 68
T = TILES_X * TILES_Y
TARGET_INSTANCES = 820_000
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from sgs_tpu.ops.pallas import flat_raster as fr

    def parse(a):
        parts = a.split(",")
        mxu = "m" in parts
        nums = [int(v) for v in parts if v != "m"]
        return nums[0], nums[1], mxu

    configs = (
        [parse(a) for a in sys.argv[1:]]
        if len(sys.argv) > 1
        else [(64, 8, False), (64, 16, False), (128, 8, False),
              (128, 16, False)]
    )
    rng = np.random.default_rng(0)
    # per-tile instance counts: heavy-tailed like a real capture
    raw = rng.lognormal(mean=0.0, sigma=1.0, size=T)
    counts = np.maximum((raw / raw.sum() * TARGET_INSTANCES), 1).astype(np.int64)

    base_chunk, base_krows = fr.CHUNK, fr.KROWS
    base_mxu = fr.MOMENT_MXU
    for chunk, krows, mxu in configs:
        fr.CHUNK, fr.KROWS, fr.MOMENT_MXU = chunk, krows, mxu
        try:
            nch = -(-counts // chunk)
            crs = np.cumsum(nch) - nch
            rows_used = int(crs[-1] + nch[-1])
            max_rows = -(-rows_used // krows) * krows
            slots = max_rows * chunk
            print(f"# CHUNK={chunk} KROWS={krows}: rows {rows_used} "
                  f"(padded {max_rows}), slots {slots}",
                  file=sys.stderr, flush=True)

            packed = rng.uniform(-1, 1, (fr.REC, slots)).astype(np.float32)
            # opacity lane moderate, conic positive-definite-ish so the
            # alpha math exercises the same branch mix as production
            packed[2] = np.abs(packed[2]) * 0.05 + 0.02   # ca
            packed[3] = packed[3] * 0.005                  # cb
            packed[4] = np.abs(packed[4]) * 0.05 + 0.02   # cc
            packed[5] = np.abs(packed[5]) * 0.6 + 0.2     # op
            packed[0] = rng.uniform(0, 16, slots)          # mean x in-tile
            packed[1] = rng.uniform(0, 16, slots)
            packed_t = jnp.asarray(packed)
            crs_j = jnp.asarray(crs.astype(np.int32))
            nch_j = jnp.asarray(nch.astype(np.int32))
            bg = jnp.zeros(3, jnp.float32)
            # every row live: last_contrib = slots, t_final mid-range
            aux = np.zeros((max_rows, 5, 256), np.float32)
            aux[:, 0] = 0.3
            aux[:, 1] = float(slots)
            aux[:, 2:5] = rng.uniform(-1, 1, (max_rows, 3, 256))
            aux_j = jnp.asarray(aux)

            # no lax.scan around the kernels: the remote compile service
            # chokes on scanned pallas_calls (>35 min, round-4 session).
            # Async-dispatch ITERS calls and block once — the device
            # queue serializes them, and a data dependency through the
            # operand stops any caching/hoisting.
            @jax.jit
            def run_fwd(p):
                c, tf, lc = fr.forward_flat(p, crs_j, nch_j, T, TILES_X)
                return p + 1e-20 * jnp.mean(c), jnp.mean(tf)

            @jax.jit
            def run_bwd(p):
                g = fr.backward_flat(
                    p, crs_j, nch_j, bg, aux_j, TILES_X, T
                )
                return p + 1e-20 * jnp.mean(g), jnp.mean(g)

            def time_loop(fn, p):
                p2, o = fn(p)
                jax.block_until_ready(o)
                t0 = time.perf_counter()
                for _ in range(ITERS):
                    p2, o = fn(p2)
                jax.block_until_ready(o)
                return (time.perf_counter() - t0) / ITERS * 1e3

            fwd_ms = time_loop(run_fwd, packed_t)
            bwd_ms = time_loop(run_bwd, packed_t)
            print(f"CHUNK={chunk} KROWS={krows} mxu={int(mxu)} "
                  f"rows={max_rows} slots={slots}: fwd {fwd_ms:.2f} ms  "
                  f"bwd {bwd_ms:.2f} ms "
                  f"(ratio {bwd_ms / fwd_ms:.2f})", flush=True)
        finally:
            fr.CHUNK, fr.KROWS, fr.MOMENT_MXU = (
                base_chunk, base_krows, base_mxu
            )


if __name__ == "__main__":
    main()
