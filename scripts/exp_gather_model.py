#!/usr/bin/env python
"""TPU random row-gather cost model: rows gathered x source-table size
x row width x index locality. Everything in the binning/reduction path
is bounded by this; measure it properly once.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
from dtime import device_ms


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    out_rows = 1_019_904

    print(f"gather {out_rows} rows; times in ms / ns-per-row")
    for src_rows in (2_064_384, 1_019_904, 425_984, 131_072):
        for rec in (16, 8):
            table = jnp.asarray(
                rng.normal(size=(src_rows, rec)).astype(np.float32)
            )
            idx = jnp.asarray(
                rng.integers(0, src_rows, size=out_rows).astype(np.int32)
            )
            f = jax.jit(lambda t, i: t[i])
            f(table, idx).block_until_ready()
            ms, _ = device_ms(f, (table, idx), iters=4)
            print(
                f"  src={src_rows:9d} rec={rec:2d} ({src_rows*rec*4/2**20:6.1f} MB): "
                f"{ms:6.2f}  {ms*1e6/out_rows:5.1f} ns/row"
            )

    # locality: sorted indices vs random, same table
    table = jnp.asarray(rng.normal(size=(2_064_384, 16)).astype(np.float32))
    for name, idx_np in (
        ("random", rng.integers(0, 2_064_384, size=out_rows)),
        ("sorted", np.sort(rng.integers(0, 2_064_384, size=out_rows))),
        ("blocked4k", (np.sort(rng.integers(0, 504, size=out_rows)) * 4096
                       + rng.integers(0, 4096, size=out_rows))),
    ):
        idx = jnp.asarray(idx_np.astype(np.int32))
        f = jax.jit(lambda t, i: t[i])
        f(table, idx).block_until_ready()
        ms, _ = device_ms(f, (table, idx), iters=4)
        print(f"  132MB table, {name:9s}: {ms:6.2f}  {ms*1e6/out_rows:5.1f} ns/row")


if __name__ == "__main__":
    main()
