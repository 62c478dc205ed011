#!/usr/bin/env python
"""Which SSIM conv axis is expensive? H-axis taps are sublane shifts,
W-axis taps are lane shifts (real permutes on TPU). Times each pass in
isolation, plus a W-via-transpose variant and an MXU banded-matmul
variant for the W pass.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

H, W = 1080, 1920


def timed(fn, *args, iters=20):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from sgs_tpu.ops import ssim as ssim_mod

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    w1d = ssim_mod._gaussian_window(11, 1.5)
    pad = 5

    conv_h = jax.jit(lambda a: ssim_mod._conv1d_axis(a, w1d, 1, pad))
    conv_w = jax.jit(lambda a: ssim_mod._conv1d_axis(a, w1d, 2, pad))

    print(f"H-axis pass (sublane): {timed(conv_h, x):7.3f} ms")
    print(f"W-axis pass (lane):    {timed(conv_w, x):7.3f} ms")

    # W pass via transpose -> H pass -> transpose back
    @jax.jit
    def conv_w_tr(a):
        at = jnp.transpose(a, (0, 2, 1))
        ct = ssim_mod._conv1d_axis(at, w1d, 1, pad)
        return jnp.transpose(ct, (0, 2, 1))

    d = float(jnp.max(jnp.abs(conv_w(x) - conv_w_tr(x))))
    print(f"W via transpose:       {timed(conv_w_tr, x):7.3f} ms (maxdiff {d:.1e})")

    # W pass on the MXU: banded (W, W) matrix, f32 HIGHEST
    band = np.zeros((W, W), np.float32)
    wnp = np.asarray(w1d)
    for k in range(11):
        off = k - 5
        for i in range(W):
            j = i + off
            if 0 <= j < W:
                band[j, i] = wnp[k]
    band_j = jnp.asarray(band)

    @jax.jit
    def conv_w_mxu(a):
        flat = a.reshape(3 * H, W)
        return jnp.dot(
            flat, band_j, precision=jax.lax.Precision.HIGHEST
        ).reshape(3, H, W)

    d2 = float(jnp.max(jnp.abs(conv_w(x) - conv_w_mxu(x))))
    print(f"W via MXU f32:         {timed(conv_w_mxu, x):7.3f} ms (maxdiff {d2:.1e})")

    @jax.jit
    def conv_w_mxu_default(a):
        flat = a.reshape(3 * H, W)
        return jnp.dot(flat, band_j).reshape(3, H, W)

    d3 = float(jnp.max(jnp.abs(conv_w(x) - conv_w_mxu_default(x))))
    print(f"W via MXU bf16:        {timed(conv_w_mxu_default, x):7.3f} ms (maxdiff {d3:.1e})")


if __name__ == "__main__":
    main()
