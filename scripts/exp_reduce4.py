#!/usr/bin/env python
"""Candidate production gradient reduction: presort-contiguous segments
with a LANE-PACKED hierarchical prefix.

exp_reduce3 findings: direct unsorted segment_sum 32.4 ms; sorted-key
segment_sum no better (XLA scatter-lowers regardless); cumsum-diff 23 ms
because a (M, 9) cumsum runs at 9/128 lane occupancy.

This variant packs 8 consecutive 16-lane grad records per row
((M,16) -> (M/8,128)) so the cumsum runs full-width, then evaluates the
exclusive prefix at the N segment boundaries with two (N,128) row
gathers + elementwise group sums. Pipeline:

  plumbing (fwd):  carry presort index through the tile sort; ONE
                   pad-offset fill; ONE cheap (key,val) int sort
  backward:        (M,16) row gather into presort order
                   (M/8,128) cumsum
                   2 (N,128) boundary row gathers + group arithmetic

Compares numerics vs the direct segment_sum and vs float64.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
from dtime import device_ms

N = 100_000
M = 1_019_904
SLOTS = 2_064_384


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    reps = rng.integers(1, 17, size=N)
    keys_presort = np.repeat(np.arange(N, dtype=np.int32), reps)[:M]
    total = keys_presort.shape[0]
    if total < M:
        keys_presort = np.pad(keys_presort, (0, M - total), constant_values=N)
    slot_of_inst = rng.permutation(SLOTS)[:M].astype(np.int32)
    starts = np.searchsorted(keys_presort, np.arange(N)).astype(np.int32)
    ends = np.searchsorted(keys_presort, np.arange(N), side="right").astype(
        np.int32
    )

    # grads with realistic sign structure (zero-mean)
    padgrad_np = rng.normal(size=(SLOTS, 16)).astype(np.float32)
    padgrad = jnp.asarray(padgrad_np)
    slot_j = jnp.asarray(slot_of_inst)
    keys_j = jnp.asarray(np.minimum(keys_presort, N - 1))
    live_j = jnp.asarray(keys_presort < N)
    starts_j, ends_j = jnp.asarray(starts), jnp.asarray(ends)

    # ---- A: direct segment_sum (production today)
    def red_a(padgrad):
        g = padgrad[slot_j][:, :9]
        g = jnp.where(live_j[:, None], g, 0.0)
        return jax.ops.segment_sum(g, keys_j, num_segments=N)

    # note: production A keys on slot order; this A gathers first so that
    # A and E share inputs exactly — measure A_slot separately
    slot_keys = np.full((SLOTS,), N, np.int32)
    slot_keys[slot_of_inst] = keys_presort
    slot_keys_j = jnp.asarray(slot_keys)

    def red_a_slot(padgrad):
        vals = jnp.where((slot_keys_j < N)[:, None], padgrad[:, :9], 0.0)
        return jax.ops.segment_sum(
            vals, jnp.minimum(slot_keys_j, N - 1), num_segments=N
        )

    fa = jax.jit(red_a_slot)
    ra = fa(padgrad)
    a_ms, _ = device_ms(fa, (padgrad,), iters=4)

    # ---- E: lane-packed hierarchical prefix
    def red_e(padgrad):
        g = padgrad[slot_j]  # (M, 16) presort order
        g = jnp.where(live_j[:, None], g, 0.0)
        rows = g.reshape(M // 8, 128)
        cs = jnp.cumsum(rows, axis=0)  # full-lane cumsum
        cs = jnp.concatenate([jnp.zeros((1, 128), jnp.float32), cs], axis=0)

        def prefix_at(pos):  # (N,) positions -> (N, 16) exclusive prefix
            r = pos // 8
            k = pos % 8
            a_prev = cs[r]  # (N, 128): sums over rows < r
            a_cur = cs[r + 1]  # includes row r
            gp = a_prev.reshape(-1, 8, 16)
            gc = a_cur.reshape(-1, 8, 16)
            full = jnp.sum(gp, axis=1)  # all groups before row r
            within = jnp.where(
                (jnp.arange(8)[None, :, None] < k[:, None, None]),
                gc - gp, 0.0,
            ).sum(axis=1)
            return full + within

        pe = prefix_at(ends_j)
        ps = prefix_at(starts_j)
        return (pe - ps)[:, :9]

    fe = jax.jit(red_e)
    re = fe(padgrad)
    e_ms, _ = device_ms(fe, (padgrad,), iters=4)

    # ---- plumbing cost (forward side): 1 fill + 1 two-array sort
    inst_s = jnp.asarray(rng.permutation(M).astype(np.int32))

    def plumb(inst_s):
        fillsrc = jnp.zeros((M,), jnp.int32).at[inst_s[:8160]].max(
            inst_s[:8160], mode="drop"
        )
        ps = jnp.arange(M, dtype=jnp.int32) + jax.lax.cummax(fillsrc)
        _, slot = jax.lax.sort((inst_s, ps), num_keys=1, is_stable=True)
        return slot

    fp = jax.jit(plumb)
    fp(inst_s).block_until_ready()
    p_ms, _ = device_ms(fp, (inst_s,), iters=4)

    # ---- numerics vs float64
    g64 = padgrad_np[slot_of_inst].astype(np.float64)
    g64[~np.asarray(live_j)] = 0.0
    ref = np.add.reduceat(
        g64, np.minimum(starts, M - 1), axis=0
    )
    ref[starts == ends] = 0.0
    ref = ref[:, :9]
    err_a = float(np.max(np.abs(np.asarray(ra) - ref)))
    err_e = float(np.max(np.abs(np.asarray(re) - ref)))
    scale = float(np.max(np.abs(ref)))
    print(f"A direct segsum (slot order):   {a_ms:7.2f} ms  err64 {err_a:.3e}")
    print(f"E lane-packed prefix pipeline:  {e_ms:7.2f} ms  err64 {err_e:.3e}")
    print(f"   plumbing (fwd, fill+sort):   {p_ms:7.2f} ms")
    print(f"   (scale {scale:.1f}; A==E {np.allclose(np.asarray(ra), np.asarray(re), atol=2e-2 * max(scale,1)):})")


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def decompose():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    padgrad = jnp.asarray(rng.normal(size=(SLOTS, 16)).astype(np.float32))
    slot_j = jnp.asarray(rng.permutation(SLOTS)[:M].astype(np.int32))
    pos_j = jnp.asarray(np.sort(rng.integers(0, M, size=N)).astype(np.int32))

    f_g = jax.jit(lambda p: p[slot_j])
    f_g(padgrad).block_until_ready()
    g_ms, _ = device_ms(f_g, (padgrad,), iters=4)

    rows = jnp.asarray(rng.normal(size=(M // 8, 128)).astype(np.float32))
    f_c = jax.jit(lambda r: jnp.cumsum(r, axis=0))
    f_c(rows).block_until_ready()
    c_ms, _ = device_ms(f_c, (rows,), iters=4)

    cs = f_c(rows)
    f_b = jax.jit(lambda cs: (cs[pos_j // 8], cs[jnp.minimum(pos_j // 8 + 1, M // 8 - 1)]))
    f_b(cs)[0].block_until_ready()
    b_ms, _ = device_ms(f_b, (cs,), iters=4)

    print(f"gather (M,16) from slots:  {g_ms:7.2f} ms")
    print(f"cumsum (M/8,128):          {c_ms:7.2f} ms")
    print(f"2x boundary row gathers:   {b_ms:7.2f} ms")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "parts":
        decompose()
