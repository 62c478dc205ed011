#!/usr/bin/env python
"""Does Mosaic support dynamic VECTOR gathers from a VMEM-resident table?

If a kernel can do `table[idx_vec]` (idx per sublane) at speed, the
whole M-scale attribute pipeline (attr gather 6.3 ms + pack gather
12.7 ms) collapses: kernels stream (slots,) int ids and gather (128, 16)
attribute rows from an N-scale table held in VMEM (100k x 64 B = 6.4 MB).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

N = 100_000
ROWS = 16128
CHUNK = 128
KROWS = 8
REC = 16


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from dtime import device_ms

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N, REC)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, N, size=(ROWS * CHUNK,)).astype(np.int32))

    def kern(ids_ref, table_ref, out_ref):
        acc = jnp.zeros((CHUNK, REC), jnp.float32)
        for j in range(KROWS):
            idx = ids_ref[j * CHUNK:(j + 1) * CHUNK]
            rec = table_ref[idx]  # dynamic vector gather from VMEM?
            acc += rec
        out_ref[...] = acc

    def run(ids, table):
        return pl.pallas_call(
            kern,
            grid=(ROWS // KROWS,),
            in_specs=[
                pl.BlockSpec((KROWS * CHUNK,), lambda k: (k,)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((CHUNK, REC), lambda k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((CHUNK, REC), jnp.float32),
        )(ids, table)

    f = jax.jit(run)
    try:
        r = f(ids, table)
        r.block_until_ready()
    except Exception as e:
        print("FAILED to compile/run:", type(e).__name__)
        print(str(e)[:1500])
        return
    ref = jnp.sum(
        table[ids].reshape(ROWS // KROWS, KROWS, CHUNK, REC), axis=(0, 1)
    )
    ok = bool(jnp.allclose(r, ref, rtol=1e-4, atol=1e-3))
    ms, _ = device_ms(f, (ids, table), iters=4)
    print(f"in-kernel VMEM gather: {ms:.2f} ms for {ROWS*CHUNK} rows, ok={ok}")


if __name__ == "__main__":
    main()
