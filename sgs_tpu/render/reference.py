"""Pure-JAX reference rasterizer — the numerical oracle.

Re-implements the full diff-gaussian-rasterization pipeline contract
(SURVEY.md §2.9; /root/reference/gaussian_renderer/__init__.py call sites)
in straight-line jnp: preprocess -> global depth sort -> per-pixel
front-to-back alpha compositing with the CUDA cutoffs (skip at power > 0,
alpha < 1/255; clamp alpha at 0.99; terminate a pixel when transmittance
would drop below 1e-4; final color C + T * bg).

O(N * P): every pixel considers every depth-sorted Gaussian, in chunks.
This is deliberately simple and exact — it is the allclose anchor for the
production tiled/Pallas kernels and is itself fully differentiable (the
backward the CUDA extension hand-writes falls out of autodiff here, with
identical treat-cutoffs-as-constant semantics).

The chunked scan keeps memory bounded: pixels are processed in row blocks
(lax.map) and Gaussians in depth-ordered chunks (lax.scan); within a chunk
the termination latch is resolved with cumulative products + a first-
violation argmax, which is exact because transmittance is monotone.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from sgs_tpu.core.projection import (
    ALPHA_MAX,
    ALPHA_MIN,
    TILE,
    TRANSMITTANCE_EPS,
)


def _composite_pixel_block(
    pix_xy: jnp.ndarray,  # (P, 2) float pixel centers (integer coords as float)
    chunks: dict,  # each leaf (num_chunks, G, ...) depth-sorted Gaussian data
    bg: jnp.ndarray,  # (3,)
) -> jnp.ndarray:
    P = pix_xy.shape[0]
    G = chunks["mean2d"].shape[1]
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)
    pix_tx = (pix_xy[:, 0] / TILE).astype(jnp.int32)  # (P,)
    pix_ty = (pix_xy[:, 1] / TILE).astype(jnp.int32)

    def step(carry, chunk):
        C, T, done = carry
        m2d, conic, rgb, opac, valid = (
            chunk["mean2d"],
            chunk["conic"],
            chunk["rgb"],
            chunk["opacity"],
            chunk["valid"],
        )
        d = m2d[None, :, :] - pix_xy[:, None, :]  # (P, G, 2): xy - pixf
        dx, dy = d[..., 0], d[..., 1]
        power = (
            -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy)
            - conic[None, :, 1] * dx * dy
        )
        alpha = jnp.minimum(ALPHA_MAX, opac[None, :] * jnp.exp(power))
        # CUDA rect semantics: a Gaussian only touches pixels whose 16x16
        # tile lies in its radius rect — tails beyond it never composite.
        in_rect = (
            (pix_tx[:, None] >= chunk["rect"][None, :, 0])
            & (pix_tx[:, None] < chunk["rect"][None, :, 1])
            & (pix_ty[:, None] >= chunk["rect"][None, :, 2])
            & (pix_ty[:, None] < chunk["rect"][None, :, 3])
        )
        a = jnp.where(
            (power <= 0.0) & (alpha >= ALPHA_MIN) & valid[None, :] & in_rect,
            alpha,
            0.0,
        )
        u = 1.0 - a
        s_incl = jnp.cumprod(u, axis=1)
        t_after = T[:, None] * s_incl
        # First Gaussian whose compositing would push T below the epsilon is
        # excluded and terminates the pixel (CUDA: test-before-composite).
        viol = (a > 0.0) & (t_after < TRANSMITTANCE_EPS)
        any_viol = jnp.any(viol, axis=1)
        first_viol = jnp.argmax(viol, axis=1)
        stop_idx = jnp.where(any_viol, first_viol, G)
        keep = (col_idx < stop_idx[:, None]) & (~done[:, None])
        s_excl = jnp.concatenate([jnp.ones((P, 1), s_incl.dtype), s_incl[:, :-1]], axis=1)
        w = T[:, None] * s_excl * a * keep.astype(a.dtype)
        # (P, G) @ (G, 3) MXU contraction; fp32 accumulation for parity.
        C = C + jnp.matmul(w, rgb, precision=jax.lax.Precision.HIGHEST)
        T = T * jnp.prod(jnp.where(keep, u, 1.0), axis=1)
        done = done | any_viol
        return (C, T, done), None

    init = (
        jnp.zeros((P, 3), pix_xy.dtype),
        jnp.ones((P,), pix_xy.dtype),
        jnp.zeros((P,), bool),
    )
    # Rematerialize in the backward pass: without this, autodiff stores the
    # (P, G) alpha/weight intermediates of EVERY chunk (O(P*N) memory — OOM
    # at real sizes); with it only the small per-chunk carry is kept and the
    # chunk math is recomputed, mirroring the CUDA backward's re-walk.
    (C, T, _), _ = jax.lax.scan(jax.checkpoint(step), init, chunks)
    return C + T[:, None] * bg[None, :]


@partial(
    jax.jit,
    static_argnames=("width", "height", "chunk_size", "pixel_block"),
)
def rasterize_sorted(
    mean2d: jnp.ndarray,  # (N, 2) pixel-space centers (pre-tap-adjusted)
    depth: jnp.ndarray,  # (N,)
    conic: jnp.ndarray,  # (N, 3)
    rgb: jnp.ndarray,  # (N, 3)
    opacity: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,) bool — radius > 0 and alive
    bg: jnp.ndarray,  # (3,)
    width: int,
    height: int,
    radius: Optional[jnp.ndarray] = None,  # (N,) for CUDA tile-rect limits
    chunk_size: int = 256,
    pixel_block: int = 16384,
) -> jnp.ndarray:
    """Depth-sort and composite. Returns (3, H, W) image.

    If `radius` is given, each Gaussian only composites into pixels of the
    16x16 tiles inside its radius rect — the CUDA binning footprint. With
    radius=None the rect is unbounded (pure mathematical compositing).
    """
    n = mean2d.shape[0]
    dtype = jnp.promote_types(jnp.result_type(mean2d, rgb, opacity), jnp.float32)
    # Stable ascending depth sort with invalid entries pushed to the end.
    sort_key = jnp.where(valid, depth, jnp.inf)
    order = jnp.argsort(sort_key, stable=True)
    num_chunks = -(-n // chunk_size)
    pad = num_chunks * chunk_size - n

    def gather_pad(x, fill=0.0):
        x = x[order]
        if pad:
            pad_widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
            x = jnp.pad(x, pad_widths, constant_values=fill)
        return x.reshape((num_chunks, chunk_size) + x.shape[1:])

    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    if radius is not None:
        r = radius.astype(dtype)
        rect = jnp.stack(
            [
                jnp.clip(((mean2d[:, 0] - r) / TILE).astype(jnp.int32), 0, tiles_x),
                jnp.clip(
                    ((mean2d[:, 0] + r + TILE - 1) / TILE).astype(jnp.int32),
                    0,
                    tiles_x,
                ),
                jnp.clip(((mean2d[:, 1] - r) / TILE).astype(jnp.int32), 0, tiles_y),
                jnp.clip(
                    ((mean2d[:, 1] + r + TILE - 1) / TILE).astype(jnp.int32),
                    0,
                    tiles_y,
                ),
            ],
            axis=-1,
        )
    else:
        rect = jnp.broadcast_to(
            jnp.asarray([0, tiles_x, 0, tiles_y], jnp.int32), (n, 4)
        )

    chunks = {
        "mean2d": gather_pad(mean2d.astype(dtype)),
        "conic": gather_pad(conic.astype(dtype)),
        "rgb": gather_pad(rgb.astype(dtype)),
        "opacity": gather_pad(opacity.astype(dtype)),
        "valid": gather_pad(valid, fill=False),
        "rect": gather_pad(rect, fill=0),
    }

    # Pixel grid: CUDA pixf = (float)pix for integer pixel coords.
    ys = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    xs = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    pix = jnp.stack([xs.ravel(), ys.ravel()], axis=-1)  # (H*W, 2)

    total = height * width
    block = min(pixel_block, total)
    num_blocks = -(-total // block)
    pix_pad = num_blocks * block - total
    if pix_pad:
        pix = jnp.pad(pix, ((0, pix_pad), (0, 0)))
    pix_blocks = pix.reshape(num_blocks, block, 2)

    bg = bg.astype(dtype)
    out = jax.lax.map(lambda p: _composite_pixel_block(p, chunks, bg), pix_blocks)
    out = out.reshape(num_blocks * block, 3)[:total]
    return out.reshape(height, width, 3).transpose(2, 0, 1)
