"""Fused Pallas SSIM kernels vs the jnp oracle.

The jnp separable shift-and-add form is itself torch-validated
(tests/test_losses.py vs /root/reference/utils/loss_utils.py:23-63); the
fused kernels must reproduce its value AND gradients to f32
summation-order noise across odd sizes (edge masks, padded rows/lanes,
single-block grids).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgs_tpu.ops.pallas import ssim_kernels as sk
from sgs_tpu.ops.ssim import _ssim_jnp


def _pair(seed, h, w):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (3, h, w)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.15, x.shape), 0, 1).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


@pytest.mark.parametrize(
    "h,w", [(37, 53), (64, 128), (100, 240), (16, 16), (48, 96)]
)
def test_fused_forward_matches_jnp(h, w):
    x, y = _pair(0, h, w)
    ref = float(_ssim_jnp(x, y, 11))
    got = float(sk.ssim_forward(x, y, interpret=True)[0])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("h,w", [(37, 53), (64, 96)])
def test_fused_gradients_match_jnp(h, w):
    x, y = _pair(1, h, w)

    gx_ref, gy_ref = jax.grad(lambda a, b: _ssim_jnp(a, b, 11), argnums=(0, 1))(
        x, y
    )

    _, p_h_t = sk.ssim_forward(x, y, interpret=True)
    gx, gy = sk.ssim_backward(x, y, p_h_t, jnp.float32(1.0), interpret=True)
    np.testing.assert_allclose(
        np.asarray(gx), np.asarray(gx_ref), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(gy), np.asarray(gy_ref), rtol=1e-4, atol=1e-6
    )


def test_fused_identical_images():
    x, _ = _pair(2, 40, 72)
    got = float(sk.ssim_forward(x, x, interpret=True)[0])
    np.testing.assert_allclose(got, 1.0, atol=1e-6)
