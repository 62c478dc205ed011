#!/usr/bin/env python
"""Can the three level-2 scatter+cummax fills merge into ONE wide fill?

_build_instances_tight runs three independent (m,) fills (f_x, f_ty,
run2), each a scatter-at-run-starts + cummax, device-traced at ~3.7 ms
apiece at m = 1M. A single (m, 4)-row scatter + axis-0 cummax carries
all three payloads in one pass if the combined row is monotone per
lane — it is: each lane is individually the same monotone sequence.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
from dtime import device_ms

M = 1_019_904
R = 425_984


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    w = rng.integers(0, 5, size=R)
    offs2 = (np.cumsum(w) - w).astype(np.int32)
    offs2 = np.minimum(offs2, M - 1)
    vx = rng.integers(0, 120, size=R).astype(np.int32)
    vy = rng.integers(0, 68, size=R).astype(np.int32)
    rid_hi = (np.arange(R, dtype=np.int32) << 7)

    offs2_j = jnp.asarray(offs2)
    px = jnp.asarray(rid_hi | vx)
    py = jnp.asarray(rid_hi | vy)

    def three(offs2, px, py):
        def fill(vals):
            marks = jnp.zeros((M,), jnp.int32).at[offs2].max(vals, mode="drop")
            return jax.lax.cummax(marks)

        return fill(px), fill(py), fill(offs2)

    f3 = jax.jit(three)
    r3 = f3(offs2_j, px, py)
    jax.block_until_ready(r3)
    ms3, _ = device_ms(f3, (offs2_j, px, py), iters=4)

    def one(offs2, px, py):
        vals = jnp.stack([px, py, offs2, jnp.zeros_like(px)], axis=1)
        marks = jnp.zeros((M, 4), jnp.int32).at[offs2].max(vals, mode="drop")
        f = jax.lax.cummax(marks, axis=0)
        return f[:, 0], f[:, 1], f[:, 2]

    f1 = jax.jit(one)
    r1 = f1(offs2_j, px, py)
    ok = all(bool(jnp.array_equal(a, b)) for a, b in zip(r3, r1))
    ms1, _ = device_ms(f1, (offs2_j, px, py), iters=4)

    # wide variant: 128-lane rows (8 groups of 4 lanes... just 4->128 pad)
    def one_wide(offs2, px, py):
        vals = jnp.stack([px, py, offs2] + [jnp.zeros_like(px)] * 5, axis=1)
        marks = jnp.zeros((M, 8), jnp.int32).at[offs2].max(vals, mode="drop")
        f = jax.lax.cummax(marks, axis=0)
        return f[:, 0], f[:, 1], f[:, 2]

    fw = jax.jit(one_wide)
    rw = fw(offs2_j, px, py)
    okw = all(bool(jnp.array_equal(a, b)) for a, b in zip(r3, rw))
    msw, _ = device_ms(fw, (offs2_j, px, py), iters=4)

    print(f"three 1-col fills:  {ms3:7.2f} ms")
    print(f"one (M,4) fill:     {ms1:7.2f} ms  ok={ok}")
    print(f"one (M,8) fill:     {msw:7.2f} ms  ok={okw}")


if __name__ == "__main__":
    main()
