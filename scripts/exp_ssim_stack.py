#!/usr/bin/env python
"""SSIM restructure experiment: the production ssim() runs 5 separable
window convs as 10 independent shift-and-add passes (device-traced
~6.7 ms fwd + ~2 ms bwd @1080p). Candidate: stack the 5 conv inputs
[img1, img2, img1^2, img2^2, img1*img2] into ONE (15, H, W) array and
run TWO shift-and-add passes — 1/5 the pass count, same math.

Measures fwd and fwd+bwd device time for both, asserts value + grad
equivalence.
"""

import math
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
    img1 = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))

    w1d = ssim_mod._gaussian_window(11, 1.5)
    pad = 5

    @jax.jit
    def ssim_cur(a, b):
        return ssim_mod.ssim(a, b)

    def _conv_axis_stacked(x, axis):
        n = 11
        xp = jnp.pad(
            x, [(0, 0)] + [(pad, pad) if a == axis else (0, 0) for a in (1, 2)]
        )
        length = x.shape[axis]
        out = jnp.zeros_like(x)
        for k in range(n):
            sl = [slice(None)] * 3
            sl[axis] = slice(k, k + length)
            out = out + w1d[k] * xp[tuple(sl)]
        return out

    @jax.jit
    def ssim_stacked(a, b):
        stack = jnp.concatenate([a, b, a * a, b * b, a * b], axis=0)
        c = _conv_axis_stacked(_conv_axis_stacked(stack, 2), 1)
        mu1, mu2 = c[0:3], c[3:6]
        mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = c[6:9] - mu1_sq
        s2 = c[9:12] - mu2_sq
        s12 = c[12:15] - mu1_mu2
        c1, c2 = 0.01**2, 0.03**2
        m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
            (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
        )
        return jnp.mean(m)

    v0 = float(ssim_cur(img1, img2))
    v1 = float(ssim_stacked(img1, img2))
    print(f"values: cur {v0:.7f} stacked {v1:.7f} (diff {abs(v0-v1):.2e})")

    g0 = jax.jit(jax.grad(ssim_mod.ssim))(img1, img2)
    g1 = jax.jit(jax.grad(ssim_stacked))(img1, img2)
    gd = float(jnp.max(jnp.abs(g0 - g1)))
    print(f"grad maxdiff: {gd:.2e}")

    print(f"fwd cur:      {timed(ssim_cur, img1, img2):7.3f} ms")
    print(f"fwd stacked:  {timed(ssim_stacked, img1, img2):7.3f} ms")
    vg_cur = jax.jit(jax.value_and_grad(ssim_mod.ssim))
    vg_stk = jax.jit(jax.value_and_grad(ssim_stacked))
    print(f"fwd+bwd cur:     {timed(vg_cur, img1, img2):7.3f} ms")
    print(f"fwd+bwd stacked: {timed(vg_stk, img1, img2):7.3f} ms")


if __name__ == "__main__":
    main()
