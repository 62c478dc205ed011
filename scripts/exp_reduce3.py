#!/usr/bin/env python
"""Gradient-reduction strategies, device-measured at bench statistics.

The backward's per-Gaussian reduction (padded slots -> (N, 9) sums) is
the single biggest frame cost: the direct unsorted segment_sum lowers to
an XLA scatter-add fusion at ~28 ms + a 2 ms internal sort + 3 ms
masking at 2.06M slots / 100k Gaussians.

Candidate replacement exploits depth-rank-major emission: pre-tile-sort
instance order has every Gaussian's instances CONTIGUOUS. Carrying the
pre-sort index through the (already present) tile sort plus ONE extra
cheap int sort yields, for every pre-sort instance, its padded slot —
then the reduction is a wide row gather + a reduce over monotone
segment keys.

Variants:
  A  direct unsorted segment_sum, 9 cols (current production)
  B  direct unsorted segment_sum, 16 cols (lane-aligned rows)
  C  sorted-keys segment_sum (monotone keys, indices_are_sorted=True)
  D  cumsum + boundary-difference reduce (precision measured vs A)
  E  the extra plumbing alone: 2-int-array sort + 2 cummax fills
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
from dtime import device_ms

N = 100_000
M = 1_019_904  # live instance bucket
SLOTS = 2_064_384  # padded slots (CHUNK=128)


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # realistic multiplicity: ~8 instances per gaussian, contiguous runs
    # in presort order; slots hold a shuffled (tile-sorted) image of them
    reps = rng.integers(1, 17, size=N)
    keys_presort = np.repeat(np.arange(N, dtype=np.int32), reps)[:M]
    if keys_presort.shape[0] < M:
        keys_presort = np.pad(
            keys_presort, (0, M - keys_presort.shape[0]), constant_values=N - 1
        )
    # random slot assignment of the M presort instances
    slot_of_inst = rng.permutation(SLOTS)[:M].astype(np.int32)
    slot_keys = np.full((SLOTS,), N, np.int32)  # N = dead sentinel
    slot_keys[slot_of_inst] = keys_presort

    padgrad = jnp.asarray(rng.normal(size=(SLOTS, 16)).astype(np.float32))
    slot_keys = jnp.asarray(slot_keys)
    slot_of_inst_j = jnp.asarray(slot_of_inst)
    keys_presort_j = jnp.asarray(keys_presort)

    # ---- A: current production
    def red_a(padgrad, keys):
        vals = jnp.where((keys < N)[:, None], padgrad[:, :9], 0.0)
        return jax.ops.segment_sum(vals, jnp.minimum(keys, N - 1), num_segments=N)

    fa = jax.jit(red_a)
    ra = fa(padgrad, slot_keys)
    a_ms, _ = device_ms(fa, (padgrad, slot_keys), iters=4)

    # ---- B: 16 lane-aligned cols
    def red_b(padgrad, keys):
        vals = jnp.where((keys < N)[:, None], padgrad, 0.0)
        return jax.ops.segment_sum(vals, jnp.minimum(keys, N - 1), num_segments=N)

    fb = jax.jit(red_b)
    rb = fb(padgrad, slot_keys)
    b_ms, _ = device_ms(fb, (padgrad, slot_keys), iters=4)

    # ---- C: presort pipeline -> sorted segment_sum
    def red_c(padgrad, slot_of_inst, keys_presort):
        g = padgrad[slot_of_inst]  # (M, 16) random row gather
        return jax.ops.segment_sum(
            g[:, :9], keys_presort, num_segments=N, indices_are_sorted=True
        )

    fc = jax.jit(red_c)
    rc = fc(padgrad, slot_of_inst_j, keys_presort_j)
    c_ms, _ = device_ms(fc, (padgrad, slot_of_inst_j, keys_presort_j), iters=4)

    # ---- D: presort pipeline -> cumsum-difference
    # boundaries: first presort index of each gaussian (N-scale)
    starts = np.searchsorted(np.asarray(keys_presort), np.arange(N)).astype(
        np.int32
    )
    ends = np.searchsorted(
        np.asarray(keys_presort), np.arange(N), side="right"
    ).astype(np.int32)
    starts_j, ends_j = jnp.asarray(starts), jnp.asarray(ends)

    def red_d(padgrad, slot_of_inst, starts, ends):
        g = padgrad[slot_of_inst][:, :9]
        cs = jnp.cumsum(g, axis=0)
        cs0 = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), cs], axis=0)
        return cs0[ends] - cs0[starts]

    fd = jax.jit(red_d)
    rd = fd(padgrad, slot_of_inst_j, starts_j, ends_j)
    d_ms, _ = device_ms(fd, (padgrad, slot_of_inst_j, starts_j, ends_j), iters=4)

    # ---- E: plumbing: one extra 2-array int sort + 2 fills at M scale
    tile_like = jnp.asarray(rng.integers(0, 8160, size=M).astype(np.int32))

    def plumb(tile_like):
        k, v = jax.lax.sort(
            (tile_like, jnp.arange(M, dtype=jnp.int32)), num_keys=1,
            is_stable=True,
        )
        f1 = jax.lax.cummax(jnp.zeros((M,), jnp.int32).at[v[:N]].max(k[:N], mode="drop"))
        f2 = jax.lax.cummax(jnp.zeros((M,), jnp.int32).at[v[:N]].max(v[:N], mode="drop"))
        return f1[-1] + f2[-1]

    fe = jax.jit(plumb)
    fe(tile_like).block_until_ready()
    e_ms, _ = device_ms(fe, (tile_like,), iters=4)

    err_c = float(jnp.max(jnp.abs(rc - ra)))
    err_d = float(jnp.max(jnp.abs(rd - ra)))
    scale = float(jnp.max(jnp.abs(ra)))
    print(f"A direct segsum 9col:        {a_ms:7.2f} ms")
    print(f"B direct segsum 16col:       {b_ms:7.2f} ms")
    print(f"C gather+sorted segsum:      {c_ms:7.2f} ms  maxerr {err_c:.3e}")
    print(f"D gather+cumsum-diff:        {d_ms:7.2f} ms  maxerr {err_d:.3e} (scale {scale:.1f})")
    print(f"E plumbing (sort+2 fills):   {e_ms:7.2f} ms")


if __name__ == "__main__":
    main()
