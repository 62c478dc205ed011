#!/usr/bin/env python
"""Micro-test: in-kernel dynamic-offset DMA gather vs BlockSpec pipeline.

The flat kernels currently read a PADDED (slots, REC) array materialized
by a 12.7 ms XLA gather. Alternative: kernels DMA each row's (CHUNK, REC)
slice straight out of the tile-sorted attr array at scalar-prefetched
offsets. Risk: per-DMA issue overhead x 16k rows. This measures a
stripped kernel (DMA + trivial reduce) both ways.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
from dtime import device_ms

CHUNK = 128
KROWS = 8
REC = 16
ROWS = 16128
M = 1_019_904


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    attr = jnp.asarray(rng.normal(size=(M + CHUNK, REC)).astype(np.float32))  # +CHUNK tail pad for overrun windows
    # realistic row starts: monotone, ~63 live rows apart on average
    # 8-ALIGNED starts (tile ranges padded to sublane alignment in the
    # sort itself): Mosaic DMA accepts these where arbitrary starts fail
    starts = np.minimum(
        np.cumsum(rng.integers(1, CHUNK, size=ROWS)) & ~7, M
    ).astype(np.int32)
    starts = jnp.asarray(starts)

    # ---- variant A: BlockSpec pipeline over a padded array (the XLA
    # gather that builds it is measured separately as gather_ms)
    def pack(attr, starts):
        src = starts[:, None] + jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
        return attr[jnp.minimum(src, M)].reshape(ROWS * CHUNK, REC)

    packf = jax.jit(pack)
    packed = packf(attr, starts)
    gather_ms, _ = device_ms(packf, (attr, starts), iters=4)

    def kern_a(packed_ref, out_ref):
        acc = jnp.zeros((CHUNK, REC), jnp.float32)
        for j in range(KROWS):
            rec = packed_ref[j * CHUNK:(j + 1) * CHUNK, :]
            acc += rec + rec
        out_ref[...] = acc

    def run_a(packed):
        return pl.pallas_call(
            kern_a,
            grid=(ROWS // KROWS,),
            in_specs=[pl.BlockSpec((KROWS * CHUNK, REC), lambda k: (k, 0))],
            out_specs=pl.BlockSpec((CHUNK, REC), lambda k: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((CHUNK, REC), jnp.float32),
        )(packed)

    fa = jax.jit(run_a)
    ra = fa(packed)
    a_ms, _ = device_ms(fa, (packed,), iters=4)

    # ---- variant B: per-row dynamic DMA from HBM, double-buffered
    def kern_b(starts_ref, attr_ref, out_ref, buf, sems, acc_ref):
        k = pl.program_id(0)
        nrows = ROWS

        def dma(slot, r):
            return pltpu.make_async_copy(
                attr_ref.at[pl.ds(starts_ref[r], CHUNK), :],
                buf.at[slot],
                sems.at[slot],
            )

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros((CHUNK, REC), jnp.float32)
            dma(0, 0).start()

        for j in range(KROWS):
            r = k * KROWS + j
            slot = j % 2
            # prefetch next row into the other slot
            @pl.when(r + 1 < nrows)
            def _():
                dma(1 - slot, r + 1).start()

            dma(slot, r).wait()
            rec = buf[slot]
            acc_ref[...] += rec + rec

        out_ref[...] = acc_ref[...]

    def run_b(attr, starts):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ROWS // KROWS,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)],
            out_specs=pl.BlockSpec((CHUNK, REC), lambda k, *_: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, CHUNK, REC), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((CHUNK, REC), jnp.float32),
            ],
        )
        return pl.pallas_call(
            kern_b,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((CHUNK, REC), jnp.float32),
        )(starts, attr)

    fb = jax.jit(run_b)
    rb = fb(attr, starts)
    print("A == B:", bool(jnp.allclose(ra, rb, rtol=1e-5)))
    b_ms, _ = device_ms(fb, (attr, starts), iters=4)

    print(f"XLA pack gather:          {gather_ms:7.2f} ms")
    print(f"A (BlockSpec on padded):  {a_ms:7.2f} ms   total {gather_ms + a_ms:.2f}")
    print(f"B (in-kernel row DMA):    {b_ms:7.2f} ms")


if __name__ == "__main__":
    main()
