#!/usr/bin/env python
"""5M-regime payload experiment: what replaces the random payload
gathers? (PERF_NOTES "random-access floor": at 14.5M instances, ~53% of
the frame is random row gathers against >300 MB tables.)

Candidates measured at the 5M trace shapes (N=5M gaussians, R=10.4M
rows, M=14.5M instances):
  * G8   — the current merged-payload gather: (R,) random idx into an
           (N, 8) f32 table (160 MB — above the measured ~64 MB cliff).
  * G44  — the same 8 lanes from TWO (N, 4) tables (80 MB each).
  * G332 — the same from (N,3)+(N,3)+(N,2) tables (60/60/40 MB — all
           under the cliff if the cliff is table-byte-size).
  * SCATPROP   — no gather at all: row-scatter the ranked payload at
           monotone run starts into (R, 8) zeros + fill-forward by
           K=log2(max_seg) doubling shift+select passes (sets only at
           run starts, so where(has, v, shift(v)) propagates exactly).
  * SCATPROP_T — same but transposed (8, R): lane-minor layout so the
           elementwise passes run at full lane occupancy; scatter via
           .at[:, offs].set(vals.T).
  * SORTK k — value-carry cost of the tile sort: 1-key sort of M u32
           keys with k f32 payload arrays (the sort-aligned packer
           would absorb the slot table build if instances carry their
           payload into the sort).

Prints ms per variant; decide from data, not priors.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
from dtime import device_ms

N = 5_000_000
R = 10_400_000
M = 15_050_000


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    lanes = 8

    table = jnp.asarray(rng.normal(size=(N, lanes)).astype(np.float32))
    gidx = jnp.asarray(rng.integers(0, N, size=R).astype(np.int32))

    def time_it(name, f, args):
        jax.block_until_ready(jax.jit(f)(*args))
        ms, _ = device_ms(jax.jit(f), args, iters=3)
        print(f"  {name:14s} {ms:8.2f} ms")
        return ms

    print(f"payload routes: N={N} R={R} M={M} lanes={lanes}")

    time_it("G8", lambda t, i: t[i], (table, gidx))
    table16 = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    time_it("G16", lambda t, i: t[i], (table16, gidx))
    # slots-scale: the pack gather shapes (R-row tables, M out rows)
    sidx = jnp.asarray(rng.integers(0, R, size=M).astype(np.int32))
    rtab8 = jnp.asarray(rng.normal(size=(R, 8)).astype(np.float32))
    time_it("GS8(RxM)", lambda t, i: t[i], (rtab8, sidx))
    rtab16 = jnp.asarray(rng.normal(size=(R, 16)).astype(np.float32))
    time_it("GS16(RxM)", lambda t, i: t[i], (rtab16, sidx))
    t4a, t4b = table[:, :4], table[:, 4:]
    time_it(
        "G44",
        lambda a, b, i: (a[i], b[i]),
        (jnp.asarray(t4a), jnp.asarray(t4b), gidx),
    )
    t3a, t3b, t2c = table[:, :3], table[:, 3:6], table[:, 6:]
    time_it(
        "G332",
        lambda a, b, c, i: (a[i], b[i], c[i]),
        (jnp.asarray(t3a), jnp.asarray(t3b), jnp.asarray(t2c), gidx),
    )

    # --- scatter + fill-forward propagate ------------------------------
    # counts ~ R/N per gaussian, capped so max_seg stays ~17 (the level-1
    # tiles_y bound at 1080p); offs monotone with duplicates at count=0.
    counts = rng.poisson(R / N - 1, size=N).astype(np.int64) + 1
    counts = np.minimum(counts, 17)
    # trim to exactly R rows total
    c = np.cumsum(counts)
    n_used = int(np.searchsorted(c, R, side="right"))
    counts[n_used:] = 0
    offs_np = (np.cumsum(counts) - counts).astype(np.int32)
    max_seg = int(counts.max())
    K = max(1, int(np.ceil(np.log2(max_seg + 1))))
    offs_w = jnp.asarray(np.where(counts > 0, offs_np, R).astype(np.int32))

    def scatprop(t, o):
        buf = jnp.zeros((R, lanes), jnp.float32).at[o].set(t, mode="drop")
        has = jnp.zeros((R,), jnp.bool_).at[o].set(True, mode="drop")
        v, h = buf, has
        for k in range(K):
            s = 1 << k
            vs = jnp.concatenate([jnp.zeros((s, lanes), jnp.float32), v[:-s]])
            hs = jnp.concatenate([jnp.zeros((s,), jnp.bool_), h[:-s]])
            v = jnp.where(h[:, None], v, vs)
            h = h | hs
        return v

    time_it(f"SCATPROP(K={K})", scatprop, (table, offs_w))

    def scatprop_t(t, o):
        buf = jnp.zeros((lanes, R), jnp.float32).at[:, o].set(
            t.T, mode="drop"
        )
        has = jnp.zeros((1, R), jnp.bool_).at[:, o].set(True, mode="drop")
        v, h = buf, has
        for k in range(K):
            s = 1 << k
            vs = jnp.concatenate(
                [jnp.zeros((lanes, s), jnp.float32), v[:, :-s]], axis=1
            )
            hs = jnp.concatenate(
                [jnp.zeros((1, s), jnp.bool_), h[:, :-s]], axis=1
            )
            v = jnp.where(h, v, vs)
            h = h | hs
        return v

    time_it(f"SCATPROP_T(K={K})", scatprop_t, (table, offs_w))

    # --- sort value-carry cost ----------------------------------------
    keys = jnp.asarray(rng.integers(0, 8160, size=M).astype(np.uint32))
    vals = [
        jnp.asarray(rng.normal(size=(M,)).astype(np.float32))
        for _ in range(9)
    ]
    for k in (1, 3, 5, 9):

        def sortk(keys, *vs):
            return jax.lax.sort((keys,) + vs, num_keys=1, is_stable=True)

        time_it(f"SORT+{k}vals", sortk, (keys, *vals[:k]))


if __name__ == "__main__":
    main()
