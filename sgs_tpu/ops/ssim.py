"""SSIM with the reference's exact windowing, in jnp.

Matches /root/reference/utils/loss_utils.py:23-63: 11x11 Gaussian window
(sigma 1.5, normalized), depthwise conv2d with zero padding window//2,
C1 = 0.01^2, C2 = 0.03^2, mean over the full (padded-edge-included) map.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gaussian_window(window_size: int, sigma: float) -> jnp.ndarray:
    xs = jnp.arange(window_size, dtype=jnp.float32)
    g = jnp.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _depthwise_conv2d(img: jnp.ndarray, window2d: jnp.ndarray, pad: int) -> jnp.ndarray:
    """img (C, H, W), window2d (k, k) applied per channel, zero padding."""
    c = img.shape[0]
    lhs = img[None]  # (1, C, H, W)
    rhs = jnp.tile(window2d[None, None], (c, 1, 1, 1))  # (C, 1, k, k)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0]


@partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over a (C, H, W) image pair."""
    sigma = 1.5
    w1d = _gaussian_window(window_size, sigma)
    window = jnp.outer(w1d, w1d)
    pad = window_size // 2
    conv = lambda x: _depthwise_conv2d(x, window, pad)

    mu1, mu2 = conv(img1), conv(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def l2_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((a - b) ** 2)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """20*log10(1/sqrt(mse)) per image (utils/image_utils.py:14-18);
    accepts (C, H, W) or (B, C, H, W), returns scalar or (B, 1)."""
    if img1.ndim == 3:
        mse = jnp.mean((img1 - img2) ** 2)
        return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))
    mse = jnp.mean(
        (img1 - img2).reshape(img1.shape[0], -1) ** 2, axis=1, keepdims=True
    )
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def training_loss(
    rendered: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float
) -> jnp.ndarray:
    """(1-l)*L1 + l*(1-SSIM) — train.py:104-105."""
    return (1.0 - lambda_dssim) * l1_loss(rendered, gt) + lambda_dssim * (
        1.0 - ssim(rendered, gt)
    )
