#!/usr/bin/env python
"""How does XLA TPU scatter-add cost scale with value width and rows?"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))
import numpy as np
from dtime import device_ms

def main():
    import jax, jax.numpy as jnp
    N = 100_000
    rng = np.random.default_rng(0)
    for slots in (1_296_384, 2_592_768):
        keys = jnp.asarray(rng.integers(0, N, size=(slots,)).astype(np.int32))
        for width in (1, 4, 9, 16):
            vals = jnp.asarray(rng.normal(size=(slots, width)).astype(np.float32))
            f = jax.jit(lambda v, k: jax.ops.segment_sum(v, k, num_segments=N))
            ms, _ = device_ms(f, (vals, keys), iters=3)
            print(f"slots {slots:9d} width {width:2d}: {ms:7.2f} ms")

main()
