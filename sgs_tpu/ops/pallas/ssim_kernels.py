"""Fused SSIM Pallas TPU kernels.

The reference SSIM (/root/reference/utils/loss_utils.py:23-63) needs five
11x11-windowed maps (mu1, mu2, E[x^2], E[y^2], E[xy]). The jnp
shift-and-add form re-reads each 24 MB map 11 times per separable pass
(10 passes + backward): device-traced ~9.4 ms/frame at 1080p — the
single biggest item of the round-2 "diffuse tail". These kernels stream
each array ONCE per pass:

  fwd1: (x, y) row blocks -> pointwise products -> 11-tap H-conv in VMEM
        -> P_h (15, Hp, W)
  (XLA transpose to (15, Wp, Hp) so the second conv is ALSO a sublane
   conv — lane rolls are real permutes, sublane shifts are near-free)
  fwd2: W-conv -> SSIM map -> masked partial sums (one scalar per block)

Backward mirrors it with the hand-derived map partials (custom_vjp in
sgs_tpu/ops/ssim.py): bwd1 recomputes A..E from the saved P_h_t on an
extended row range, forms dmap/d{A..E} pointwise, and applies the
transposed (= same, symmetric window) W-conv; bwd2 H-convs the result
and combines with x, y.

Cross-block halos use shifted-BlockSpec windows (the same array passed
as 2R+1 offset blocks with clamped index maps). VMEM discipline: the
window is MASKED ONCE (zero-pad conv semantics = zero rows outside the
image, which also neutralizes the edge-clamped duplicate blocks), then
every conv tap is a pure slice-scale-add — the first version built an
11-deep chain of masked (15, B, W) temps and blew the 16 MB scoped VMEM
limit by 5 MB at 1080p.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 11
PAD = WIN // 2
_SIGMA = 1.5


def _window_weights():
    g = [math.exp(-((i - PAD) ** 2) / (2.0 * _SIGMA**2)) for i in range(WIN)]
    s = sum(g)
    return [v / s for v in g]


_W = _window_weights()
C1 = 0.01**2
C2 = 0.03**2

# per-kernel row-block sizes and halo radii (R extra blocks per side),
# chosen to keep each kernel's live VMEM well under the 16 MB scope:
# fwd1 materializes a (15, (2R+1)B, W) product window, bwd1 needs a
# 2*PAD halo for its two stacked convs.
B_F1, R_F1 = 8, 1
B_F2, R_F2 = 16, 1
B_B1, R_B1 = 8, 1
B_B2, R_B2 = 8, 1


def _halo_specs(c, b, lanes, r, nb):
    """2r+1 shifted BlockSpecs over axis 1 (clamped at the edges; the
    duplicate edge blocks are neutralized by the in-kernel row masks)."""

    def mk(off):
        return pl.BlockSpec(
            (c, b, lanes),
            lambda k, *_, o=off: (0, jnp.clip(k + o, 0, nb - 1), 0),
        )

    return [mk(off) for off in range(-r, r + 1)]


def _masked_window(refs, k, b, r, bound):
    """Concatenate the 2r+1 blocks and zero rows whose GLOBAL index is
    outside [0, bound) — exact zero-pad conv semantics."""
    win = jnp.concatenate([ref[...] for ref in refs], axis=1)
    rows = win.shape[1]
    g = (k - r) * b + jax.lax.broadcasted_iota(jnp.int32, (1, rows, 1), 1)
    return jnp.where((g >= 0) & (g < bound), win, 0.0)


def _conv_taps(win, base, nrows):
    """sum_t w[t] * win[:, base + t : base + t + nrows, :] — pure
    slice-scale-adds over the pre-masked window."""
    acc = _W[0] * win[:, base:base + nrows, :]
    for t in range(1, WIN):
        acc = acc + _W[t] * win[:, base + t:base + t + nrows, :]
    return acc


def _fwd1_kernel(nrows_ref, xm_ref, xc_ref, xp_ref, out_ref):
    """Products + H-conv. Blocks (6, B, W); window = 3 blocks."""
    k = pl.program_id(0)
    win = _masked_window([xm_ref, xc_ref, xp_ref], k, B_F1, R_F1, nrows_ref[0])
    xw = win[0:3]
    yw = win[3:6]
    prod = jnp.concatenate([xw, yw, xw * xw, yw * yw, xw * yw], axis=0)
    # out row r (global k*B + r) reads prod rows B - PAD + r + t
    out_ref[...] = _conv_taps(prod, B_F1 - PAD, B_F1)


def _ssim_terms(acc):
    a, b = acc[0:3], acc[3:6]
    c, d, e = acc[6:9], acc[9:12], acc[12:15]
    n1 = 2.0 * a * b + C1
    n2 = 2.0 * (e - a * b) + C2
    d1 = a * a + b * b + C1
    d2 = (c - a * a) + (d - b * b) + C2
    return a, b, n1, n2, d1, d2


def _fwd2_kernel(meta_ref, pm_ref, pc_ref, pp_ref, out_ref):
    """W-conv + SSIM map + masked partial sum. Transposed layout:
    blocks (15, B, Hp), axis 1 is the ORIGINAL W axis, lanes are H."""
    wdim = meta_ref[0]  # original W (sublane validity bound)
    hdim = meta_ref[1]  # original H (lane validity bound)
    k = pl.program_id(0)
    hp = pc_ref.shape[2]
    win = _masked_window([pm_ref, pc_ref, pp_ref], k, B_F2, R_F2, wdim)
    acc = _conv_taps(win, B_F2 - PAD, B_F2)
    _, _, n1, n2, d1, d2 = _ssim_terms(acc)
    ssim_map = (n1 * n2) / (d1 * d2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (3, B_F2, hp), 2)
    row_g = k * B_F2 + jax.lax.broadcasted_iota(jnp.int32, (3, B_F2, hp), 1)
    live = (lane < hdim) & (row_g < wdim)
    s = jnp.sum(jnp.where(live, ssim_map, 0.0))
    # (1, 8, 128) output block: a (1, 1)-shaped block violates the
    # (8, 128) min-tile rule, so the per-block scalar is broadcast
    out_ref[0] = jnp.full((8, 128), s, jnp.float32)


def _gmap_kernel(meta_ref, pm_ref, pc_ref, pp_ref, out_ref):
    """Recompute A..E for this block's rows and form the pointwise map
    partials g = dL/d{A..E} (times 1; the scalar cotangent and 1/(3HW)
    scale outside). A single-kernel version that also applied the
    second conv on an extended row range needed a 5-block halo window
    and blew the scoped-VMEM limit by 1.9 MB — two R=1 kernels with a
    streamed intermediate are cheaper than one R=2 kernel here."""
    wdim = meta_ref[0]
    hdim = meta_ref[1]
    k = pl.program_id(0)
    hp = pc_ref.shape[2]
    win = _masked_window([pm_ref, pc_ref, pp_ref], k, B_B1, R_B1, wdim)
    acc = _conv_taps(win, B_B1 - PAD, B_B1)
    a, b, n1, n2, d1, d2 = _ssim_terms(acc)
    inv = 1.0 / (d1 * d2)
    m = n1 * n2 * inv
    ga = 2.0 * b * (n2 - n1) * inv - m * (2.0 * a / d1 - 2.0 * a / d2)
    gb = 2.0 * a * (n2 - n1) * inv - m * (2.0 * b / d1 - 2.0 * b / d2)
    gc = -m / d2
    gd = gc
    ge = 2.0 * n1 * inv
    g15 = jnp.concatenate([ga, gb, gc, gd, ge], axis=0)
    # zero cotangent outside the image (mean excludes padded pixels)
    lane = jax.lax.broadcasted_iota(jnp.int32, (15, B_B1, hp), 2)
    row_g = k * B_B1 + jax.lax.broadcasted_iota(jnp.int32, (15, B_B1, hp), 1)
    out_ref[...] = jnp.where(
        (lane < hdim) & (row_g < wdim), g15, 0.0
    )


def _conv15_kernel(meta_ref, gm_ref, gc_ref, gp_ref, out_ref):
    """Transposed W-conv of the 15-channel cotangent map (symmetric
    window => conv^T = conv; the map is already zero outside the image,
    the window mask only neutralizes edge-clamped duplicate blocks)."""
    wdim = meta_ref[0]
    k = pl.program_id(0)
    win = _masked_window([gm_ref, gc_ref, gp_ref], k, B_B1, R_B1, wdim)
    out_ref[...] = _conv_taps(win, B_B1 - PAD, B_B1)


def _bwd2_kernel(nrows_ref, gm_ref, gc_ref, gp_ref, xc_ref, out_ref):
    """H-conv of gW + pointwise combine with (x, y) -> (dx, dy)."""
    k = pl.program_id(0)
    win = _masked_window([gm_ref, gc_ref, gp_ref], k, B_B2, R_B2, nrows_ref[0])
    acc = _conv_taps(win, B_B2 - PAD, B_B2)
    x = xc_ref[0:3]
    y = xc_ref[3:6]
    dx = acc[0:3] + 2.0 * x * acc[6:9] + y * acc[12:15]
    dy = acc[3:6] + 2.0 * y * acc[9:12] + x * acc[12:15]
    out_ref[...] = jnp.concatenate([dx, dy], axis=0)


def _pad_rows(arr, b):
    """Zero-pad axis 1 up to a multiple of b."""
    s = arr.shape[1]
    sp = -(-s // b) * b
    if sp == s:
        return arr
    return jnp.pad(arr, ((0, 0), (0, sp - s), (0, 0)))


def _halo_call(kernel, scalars, arr, b, r, out_shape, out_spec, extra=None,
               interpret=False):
    """pallas_call over row blocks of `arr` with a 2r+1 shifted-block
    halo window (plus an optional cur-aligned extra operand)."""
    c, s, lanes = arr.shape
    nb = s // b
    in_specs = _halo_specs(c, b, lanes, r, nb)
    operands = [arr] * (2 * r + 1)
    if extra is not None:
        in_specs.append(
            pl.BlockSpec(
                (extra.shape[0], b, lanes), lambda k, *_: (0, k, 0)
            )
        )
        operands.append(extra)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=[out_spec],
    )
    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out_shape],
        interpret=interpret,
    )(scalars, *operands)
    return out


def ssim_forward(x, y, interpret=False):
    """x, y: (3, H, W) f32 in [0,1]. Returns (ssim_mean, P_h_t residual)."""
    h, w = x.shape[1], x.shape[2]
    xin = _pad_rows(jnp.concatenate([x, y], axis=0).astype(jnp.float32), B_F1)
    hp = xin.shape[1]

    p_h = _halo_call(
        _fwd1_kernel, jnp.asarray([h], jnp.int32), xin, B_F1, R_F1,
        jax.ShapeDtypeStruct((15, hp, w), jnp.float32),
        pl.BlockSpec((15, B_F1, w), lambda k, *_: (0, k, 0)),
        interpret=interpret,
    )

    p_h_t = _pad_rows(jnp.transpose(p_h, (0, 2, 1)), 16)  # (15, Wp, Hp)
    wp = p_h_t.shape[1]
    nb2 = wp // B_F2
    partials = _halo_call(
        _fwd2_kernel, jnp.asarray([w, h], jnp.int32), p_h_t, B_F2, R_F2,
        jax.ShapeDtypeStruct((nb2, 8, 128), jnp.float32),
        pl.BlockSpec((1, 8, 128), lambda k, *_: (k, 0, 0)),
        interpret=interpret,
    )
    mean = jnp.sum(partials[:, 0, 0]) / (3.0 * h * w)
    return mean, p_h_t


def ssim_backward(x, y, p_h_t, cot, interpret=False):
    """cot: scalar cotangent of the mean. Returns (dx, dy)."""
    h, w = x.shape[1], x.shape[2]
    wp, hp = p_h_t.shape[1], p_h_t.shape[2]

    g15 = _halo_call(
        _gmap_kernel, jnp.asarray([w, h], jnp.int32), p_h_t, B_B1, R_B1,
        jax.ShapeDtypeStruct((15, wp, hp), jnp.float32),
        pl.BlockSpec((15, B_B1, hp), lambda k, *_: (0, k, 0)),
        interpret=interpret,
    )
    gw_t = _halo_call(
        _conv15_kernel, jnp.asarray([w, h], jnp.int32), g15, B_B1, R_B1,
        jax.ShapeDtypeStruct((15, wp, hp), jnp.float32),
        pl.BlockSpec((15, B_B1, hp), lambda k, *_: (0, k, 0)),
        interpret=interpret,
    )

    gw = jnp.transpose(gw_t, (0, 2, 1))[:, :, :w]  # (15, Hp, W)
    xin = _pad_rows(jnp.concatenate([x, y], axis=0).astype(jnp.float32), B_B2)
    gw = _pad_rows(gw, B_B2)[:, : xin.shape[1], :]
    dxy = _halo_call(
        _bwd2_kernel, jnp.asarray([h], jnp.int32), gw, B_B2, R_B2,
        jax.ShapeDtypeStruct((6, xin.shape[1], w), jnp.float32),
        pl.BlockSpec((6, B_B2, w), lambda k, *_: (0, k, 0)),
        extra=xin, interpret=interpret,
    )
    scale = cot / (3.0 * h * w)
    dxy = dxy[:, :h, :] * scale
    return dxy[0:3], dxy[3:6]
