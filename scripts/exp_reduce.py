#!/usr/bin/env python
"""Experiment: per-gaussian gradient reduction variants, device-timed.

V_cur: 2-array sort + wide row gather + sorted segment_sum (current)
V0:    direct unsorted segment_sum (one scatter-add, no sort/gather)
V2:    variadic sort (key + 9 payload cols) + sorted segment_sum
V4:    variadic sort + Pallas-free cumsum-at-ends (no scatter at all)
"""

import glob
import gzip
import json
import math
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = 100_000
WIDTH, HEIGHT = 1920, 1080


def device_time(tag, fn, args, iters=6):
    import jax
    from dtime import device_ms

    f = jax.jit(fn)
    ms, _ = device_ms(f, args, iters=iters)
    print(f"{tag:44s} {ms:9.3f} ms (device)", flush=True)
    return f(*args)


def main():
    import jax
    import jax.numpy as jnp

    from sgs_tpu.ops.pallas import flat_raster as fr

    rng = np.random.default_rng(0)
    # realistic shapes from the 1080p/100k bench
    max_rows = 20256 // fr.KROWS * fr.KROWS + fr.KROWS
    slots = max_rows * fr.CHUNK
    print(f"slots={slots}")

    # realistic key structure: sorted-by-tile instance ids — each tile's
    # window is a depth-ordered subset; emulate with random ids + dead tail
    keys = rng.integers(0, N, size=slots, dtype=np.int32)
    dead = rng.random(slots) < 0.5
    keys = np.where(dead, N, keys).astype(np.int32)
    windows = jnp.asarray(keys.reshape(max_rows, fr.CHUNK))
    padgrad = jnp.asarray(
        rng.normal(size=(max_rows * fr.GREC, fr.CHUNK)).astype(np.float32)
    )

    def v_cur(padgrad, windows):
        return fr.reduce_grads(padgrad, windows, N)

    def _flat(padgrad):
        max_rows = padgrad.shape[0] // fr.GREC
        rows = padgrad.reshape(max_rows, fr.GREC, fr.CHUNK).transpose(0, 2, 1)
        return rows.reshape(max_rows * fr.CHUNK, fr.GREC)

    def v0(padgrad, windows):
        flat = _flat(padgrad)
        keys = windows.reshape(-1)
        vals = jnp.where((keys < N)[:, None], flat[:, :9], 0.0)
        return jax.ops.segment_sum(vals, jnp.minimum(keys, N - 1), num_segments=N)

    def v2(padgrad, windows):
        flat = _flat(padgrad)
        keys = windows.reshape(-1)
        cols = tuple(flat[:, i] for i in range(9))
        out = jax.lax.sort((keys,) + cols, num_keys=1, is_stable=False)
        skeys, svals = out[0], jnp.stack(out[1:], axis=1)
        svals = jnp.where((skeys < N)[:, None], svals, 0.0)
        return jax.ops.segment_sum(
            svals, jnp.minimum(skeys, N - 1), num_segments=N,
            indices_are_sorted=True,
        )

    def v4(padgrad, windows):
        flat = _flat(padgrad)
        keys = windows.reshape(-1)
        cols = tuple(flat[:, i] for i in range(9))
        out = jax.lax.sort((keys,) + cols, num_keys=1, is_stable=False)
        skeys, svals = out[0], jnp.stack(out[1:], axis=1)
        svals = jnp.where((skeys < N)[:, None], svals, 0.0)
        csum = jnp.cumsum(svals, axis=0)
        ends = jnp.searchsorted(skeys, jnp.arange(N, dtype=jnp.int32), side="right")
        starts = jnp.searchsorted(skeys, jnp.arange(N, dtype=jnp.int32), side="left")
        zero = jnp.zeros((1, 9), jnp.float32)
        cpad = jnp.concatenate([zero, csum], axis=0)
        return cpad[ends] - cpad[starts]

    r_cur = device_time("V_cur sort2+gather+segsum", v_cur, (padgrad, windows))
    r0 = device_time("V0 direct unsorted segment_sum", v0, (padgrad, windows))
    r2 = device_time("V2 variadic sort + sorted segsum", v2, (padgrad, windows))
    r4 = device_time("V4 variadic sort + cumsum-ends", v4, (padgrad, windows))

    np.testing.assert_allclose(np.asarray(r0), np.asarray(r_cur), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r_cur), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(r4), np.asarray(r_cur), rtol=1e-4, atol=1e-3)
    print("all variants agree")


if __name__ == "__main__":
    main()
