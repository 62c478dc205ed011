#!/usr/bin/env python
"""Device measurement: grad-reduction variants, round 2c.

Current production: ONE unsorted segment_sum (scatter-add) — device trace
puts it at ~43 ms/frame at 2.6M slots (fusion.21 35.4 + sort.14 3.3 +
mask fusion 4.0). XLA internally sorts (key, iota) anyway, then applies
updates in a slow custom fusion.

Variant S: hand-rolled sorted reduction — variadic-sort the 9 value
columns WITH the key (XLA TPU radix path handles multi-payload sorts
cheaply: the 3-payload M-sort costs 2.7 ms), then segmented sums via
per-column inclusive cumsum + boundary gather + diff (all N-scale
gathers). No scatter anywhere.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from dtime import device_ms

SLOTS = 2_592_768
N = 100_000


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    padgrad = jnp.asarray(rng.normal(size=(SLOTS, 16)).astype(np.float32))
    keys = jnp.asarray(
        rng.integers(0, N + 40_000, size=(SLOTS,)).astype(np.int32)
    )  # ~28% dead (>= N), like real padding

    @jax.jit
    def current(padgrad, keys):
        vals = jnp.where((keys < N)[:, None], padgrad[:, :9], 0.0)
        return jax.ops.segment_sum(
            vals, jnp.minimum(keys, N - 1), num_segments=N
        )

    @jax.jit
    def sorted_cumsum(padgrad, keys):
        cols = [padgrad[:, i] for i in range(9)]
        out = jax.lax.sort([keys] + cols, num_keys=1, is_stable=False)
        ks = out[0]
        vs = jnp.stack(out[1:], axis=1)  # (SLOTS, 9) sorted by key
        vs = jnp.where((ks < N)[:, None], vs, 0.0)
        csum = jnp.cumsum(vs, axis=0)  # inclusive, (SLOTS, 9)
        # per-gaussian sum = csum[end_g] - csum[end_{g-1}] where end_g is
        # the last slot with key <= g: searchsorted at N scale
        ends = jnp.searchsorted(ks, jnp.arange(N, dtype=jnp.int32),
                                side="right").astype(jnp.int32)
        c_at = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), csum])[ends]
        prev = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), c_at[:-1]])
        return c_at - prev

    @jax.jit
    def sorted_cumsum_packed(padgrad, keys):
        # same but cumsum as one (SLOTS, 9) array without restacking
        cols = [padgrad[:, i] for i in range(9)]
        out = jax.lax.sort([keys] + cols, num_keys=1, is_stable=False)
        ks = out[0]
        live = ks < N
        csums = [jnp.cumsum(jnp.where(live, v, 0.0)) for v in out[1:]]
        ends = jnp.searchsorted(ks, jnp.arange(N, dtype=jnp.int32),
                                side="right").astype(jnp.int32)
        outs = []
        for c in csums:
            ca = jnp.concatenate([jnp.zeros((1,), jnp.float32), c])[ends]
            outs.append(ca - jnp.concatenate(
                [jnp.zeros((1,), jnp.float32), ca[:-1]]))
        return jnp.stack(outs, axis=1)

    r0 = current(padgrad, keys)
    r1 = sorted_cumsum(padgrad, keys)
    r2 = sorted_cumsum_packed(padgrad, keys)
    print("allclose S:", bool(jnp.allclose(r0, r1, atol=1e-2)),
          "S2:", bool(jnp.allclose(r0, r2, atol=1e-2)))
    err = float(jnp.max(jnp.abs(r0 - r1)))
    print("max abs diff:", err)

    for name, fn in [("current scatter-add", current),
                     ("variadic sort + cumsum-diff", sorted_cumsum),
                     ("variadic sort + col cumsums", sorted_cumsum_packed)]:
        ms, _ = device_ms(fn, (padgrad, keys), iters=4)
        print(f"{name:36s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
