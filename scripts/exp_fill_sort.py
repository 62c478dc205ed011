#!/usr/bin/env python
"""Level-2 expansion fill strategy experiment.

Current production (_build_instances_tight): TWO M-scale scatter-max +
cummax fills (device-traced 4.3 + 3.7 ms at M=1.02M) build (rid,
base_tile, run_start) per instance, then ONE 3-array stable sort by
tile id.

Candidate (merge-fill): append the R run-start records as EXTRA
elements and let ONE stable sort at (M+R) scale place them before
their runs; cummax fills flow along the sorted order for free. The
downstream tile sort then runs at (M+R) with dead filler entries
sorting to the tail (tile id = num_tiles), so the first-M slice of the
sorted outputs is unchanged.

Measures both composites end-to-end (enqueue-20, block-once) and
asserts identical (tile_s, rowid_s, inst_s).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

R_CAP = 425_984
M_CAP = 1_019_904
NUM_TILES = 8160
TILES_X = 120


def timed(fn, *args, iters=20):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    rs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(rs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    i32 = jnp.int32
    u32 = jnp.uint32
    rng = np.random.default_rng(0)

    # synthetic row table shaped like bench: ~337k live rows, widths 1-8
    n_rows_live = 337_514
    w_np = np.zeros((R_CAP,), np.int64)
    w_np[:n_rows_live] = rng.integers(1, 7, n_rows_live)
    # scale to ~815k instances
    total = w_np.sum()
    ty_np = np.sort(rng.integers(0, 68, R_CAP))
    txlo_np = rng.integers(0, 100, R_CAP)
    print(f"rows {n_rows_live} instances {total}")

    w = jnp.asarray(w_np.astype(np.int32))
    ty = jnp.asarray(ty_np.astype(np.int32))
    txlo = jnp.asarray(txlo_np.astype(np.int32))

    tb = int(NUM_TILES).bit_length()

    @jax.jit
    def current(w, ty, txlo):
        m = M_CAP
        offs2 = jnp.cumsum(w) - w
        total = offs2[-1] + w[-1]
        run2 = jax.lax.cummax(
            jnp.zeros((m,), i32).at[offs2].max(offs2.astype(i32), mode="drop")
        )
        inst = jnp.arange(m, dtype=i32)
        rank2 = inst - run2
        start_tile = (ty * TILES_X + txlo).astype(u32)
        vals = (jnp.arange(R_CAP, dtype=u32) << tb) | start_tile
        f_g = jax.lax.cummax(
            jnp.zeros((m,), u32).at[offs2].max(vals, mode="drop")
        )
        rid = (f_g >> tb).astype(i32)
        base_tile = (f_g & ((1 << tb) - 1)).astype(i32)
        live = inst < jnp.minimum(total, m)
        tile_id = jnp.where(live, base_tile + rank2, NUM_TILES).astype(i32)
        tile_s, rowid_s, inst_s = jax.lax.sort(
            (tile_id, rid, inst), num_keys=1, is_stable=True
        )
        return tile_s, rowid_s, inst_s

    @jax.jit
    def merged(w, ty, txlo):
        m = M_CAP
        mr = M_CAP + R_CAP
        offs2 = jnp.cumsum(w) - w
        total = offs2[-1] + w[-1]
        # merge keys: run-start records at their offsets, then all M
        # positions; stable sort puts each record BEFORE its run
        keys = jnp.concatenate(
            [jnp.minimum(offs2, m - 1).astype(i32), jnp.arange(m, dtype=i32)]
        )
        start_tile = (ty * TILES_X + txlo).astype(u32)
        recs = (jnp.arange(R_CAP, dtype=u32) << tb) | start_tile
        vals = jnp.concatenate([recs, jnp.zeros((m,), u32)])
        # rec entries carry offs2 (>= 0), iota entries carry -1: the
        # pre-cummax payload doubles as the rec/iota flag and the cummax
        # gives the run start (iota's -1 never dominates)
        vofs = jnp.concatenate(
            [offs2.astype(i32), jnp.full((m,), -1, i32)]
        )
        ks, vs, vo = jax.lax.sort((keys, vals, vofs), num_keys=1, is_stable=True)
        f_g = jax.lax.cummax(vs)
        run2 = jax.lax.cummax(vo)
        rid = (f_g >> tb).astype(i32)
        base_tile = (f_g & ((1 << tb) - 1)).astype(i32)
        inst = ks  # for iota entries the key IS the original index
        rank2 = inst - run2
        live = (vo < 0) & (inst < jnp.minimum(total, m))
        tile_id = jnp.where(live, base_tile + rank2, NUM_TILES).astype(i32)
        tile_s, rowid_s, inst_s = jax.lax.sort(
            (tile_id, rid, inst), num_keys=1, is_stable=True
        )
        return tile_s[:m], rowid_s[:m], inst_s[:m]

    a = current(w, ty, txlo)
    b = merged(w, ty, txlo)
    tot = int(jnp.minimum(jnp.sum(w), M_CAP))
    for name, x, y in zip(("tile", "rowid", "inst"), a, b):
        same = bool(jnp.all(x[:tot] == y[:tot]))
        print(f"{name}: match={same}")

    print(f"current: {timed(current, w, ty, txlo):7.3f} ms")
    print(f"merged:  {timed(merged, w, ty, txlo):7.3f} ms")


if __name__ == "__main__":
    main()
