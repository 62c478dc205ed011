#!/usr/bin/env python
"""Gather cost vs SOURCE LAYOUT: XLA picks {0,1} (transposed-compact)
for narrow (N, rec) arrays it owns, but Pallas outputs are {1,0}
row-major (lane-padded 8-16x). Production gathers read Pallas outputs;
exp_gather_model measured XLA-compact tables. Pin down both.

A Pallas identity kernel forces a {1,0} copy of the table; gathering
from it vs from the XLA-native array isolates the layout effect.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
from dtime import device_ms

OUT_ROWS = 1_019_904
SRC = 2_064_384


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, SRC, size=OUT_ROWS).astype(np.int32))

    for rec in (16, 8):
        table = jnp.asarray(rng.normal(size=(SRC, rec)).astype(np.float32))

        def ident(x):
            def kern(x_ref, o_ref):
                o_ref[...] = x_ref[...]

            return pl.pallas_call(
                kern,
                grid=(SRC // 8192,),
                in_specs=[pl.BlockSpec((8192, rec), lambda k: (k, 0))],
                out_specs=pl.BlockSpec((8192, rec), lambda k: (k, 0)),
                out_shape=jax.ShapeDtypeStruct((SRC, rec), jnp.float32),
            )(x)

        # gather straight from the XLA-native array
        f_x = jax.jit(lambda t: t[idx])
        f_x(table).block_until_ready()
        x_ms, _ = device_ms(f_x, (table,), iters=4)

        # gather from a Pallas-produced {1,0} buffer (fused: identity
        # kernel then gather, all device-side)
        f_p = jax.jit(lambda t: ident(t)[idx])
        f_p(table).block_until_ready()
        p_ms, _ = device_ms(f_p, (table,), iters=4)

        # identity kernel alone (to subtract)
        f_i = jax.jit(ident)
        f_i(table).block_until_ready()
        i_ms, _ = device_ms(f_i, (table,), iters=4)

        print(
            f"rec={rec:2d}: xla-native {x_ms:6.2f} ms | pallas+gather "
            f"{p_ms:6.2f} (ident alone {i_ms:5.2f} -> gather ~{p_ms - i_ms:6.2f})"
        )


if __name__ == "__main__":
    main()
