"""Pallas TPU kernels for per-tile Gaussian compositing.

The hot loop of the framework. The XLA instance-major path
(render/tiled.py) must process every instance; this kernel instead walks
each 16x16 tile's depth-sorted instance range in VMEM chunks and STOPS as
soon as every pixel of the tile is saturated (transmittance < 1e-4) — the
early-termination win that makes the CUDA rasterizer fast on opaque
scenes.

TPU-shaped layout (everything lane-aligned for Mosaic):
  - instances are packed CHUNK(=128)-padded per tile into an
    (R * REC, CHUNK) f32 HBM array: rows [r*REC, (r+1)*REC) hold chunk r's
    REC=16 attribute lanes [mean_x, mean_y, conic_a, conic_b, conic_c,
    opacity, red, green, blue, pad...] — so every DMA is an aligned
    (REC, CHUNK) block and padded slots have opacity 0 (alpha 0);
  - per-tile chunk-row offsets/counts + the tile's position in the
    unpadded sorted order arrive via scalar prefetch;
  - compute orientation: pixels on sublanes (256), instances on lanes
    (CHUNK): alphas are (256, CHUNK) VPU ops, the in-chunk ordering is a
    Hillis-Steele cumulative product along lanes, and color accumulates
    with a transpose-free (256, CHUNK) x (CHUNK, 3) MXU contraction.

Outputs: per-tile colors (T, 256, 3), final transmittance and
last-contributor position as (T, 256, 8) (lane-padded; column 0 is the
value) — squeezed by the wrapper to the same contract as the XLA forward,
so the shared custom-VJP backward applies unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgs_tpu.core.projection import (
    ALPHA_MAX,
    ALPHA_MIN,
    TILE,
    TRANSMITTANCE_EPS,
)

TILE_PIXELS = TILE * TILE  # 256
REC = 16  # attribute rows per chunk (9 used)
CHUNK = 128  # instances per chunk (lane width)
OUT_PAD = 8  # lane padding of the scalar per-pixel outputs


def pack_chunked_instances(
    mean2d, conic, rgb, opacity, g_sorted, tile_sorted, num_tiles, max_chunk_rows
):
    """Build the chunk-padded SoA instance buffer + per-tile chunk offsets.

    Returns (packed (max_chunk_rows*REC, CHUNK), chunk_row_start (T,),
    n_chunks (T,), tile_start (T,)).
    """
    m = g_sorted.shape[0]
    f32 = jnp.float32
    tiles = jnp.arange(num_tiles, dtype=tile_sorted.dtype)
    tile_start = jnp.searchsorted(tile_sorted, tiles, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tiles, side="right").astype(jnp.int32)
    counts = tile_end - tile_start
    n_chunks = -(-counts // CHUNK)
    chunk_row_start = (jnp.cumsum(n_chunks) - n_chunks).astype(jnp.int32)
    rows_used = chunk_row_start[-1] + n_chunks[-1] if num_tiles else 0

    # GATHER formulation (TPU scatters are slow), with WIDE rows: nine
    # separate 1D scalar gathers cost ~18x more than one (N, 16) row
    # gather, so attributes are packed into a per-Gaussian record matrix
    # first and every padded slot gathers one 64-byte row.
    attr_matrix = jnp.concatenate(
        [
            mean2d, conic, opacity[:, None], rgb,
            jnp.zeros((opacity.shape[0], REC - 9), f32),
        ],
        axis=1,
    ).astype(f32)  # (N, REC)

    rowv = jnp.arange(max_chunk_rows, dtype=jnp.int32)
    # tile owning chunk row r (rows past rows_used map to the last tile and
    # are masked below)
    row_tile = (
        jnp.searchsorted(chunk_row_start, rowv, side="right").astype(jnp.int32) - 1
    )
    row_tile = jnp.clip(row_tile, 0, num_tiles - 1)
    lanes = jnp.arange(CHUNK, dtype=jnp.int32)
    src = (
        tile_start[row_tile][:, None]
        + (rowv - chunk_row_start[row_tile])[:, None] * CHUNK
        + lanes[None, :]
    )  # (R, CHUNK) -> index into the sorted instance order
    slot_ok = (rowv[:, None] < rows_used) & (src < tile_end[row_tile][:, None])
    src = jnp.clip(src, 0, m - 1)
    g_slot = g_sorted[src]  # (R, CHUNK)
    rows = jnp.where(
        slot_ok[:, :, None], attr_matrix[g_slot], 0.0
    )  # (R, CHUNK, REC)
    packed = rows.transpose(0, 2, 1).reshape(max_chunk_rows * REC, CHUNK)
    return packed, chunk_row_start, n_chunks, tile_start


def _forward_kernel(
    # scalar prefetch
    chunk_row_ref, n_chunks_ref, tile_start_ref, tiles_x_ref,
    # inputs
    inst_hbm,  # (R*REC, CHUNK) in ANY/HBM
    # output (blocked per tile): [r, g, b, t_final, last_contrib, pad...]
    out_ref,  # (1, 256, OUT_PAD) f32
    # scratch
    buf,  # (2, REC, CHUNK) VMEM
    sems,  # (2,) DMA semaphores
):
    t = pl.program_id(0)
    row0 = chunk_row_ref[t]
    num_chunks = n_chunks_ref[t]
    tstart = tile_start_ref[t]
    tiles_x = tiles_x_ref[0]

    p_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIXELS, CHUNK), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIXELS, CHUNK), 1)
    tx = ((t % tiles_x) * TILE).astype(jnp.float32)
    ty = ((t // tiles_x) * TILE).astype(jnp.float32)
    px = tx + jax.lax.rem(p_idx, TILE).astype(jnp.float32)  # (256, CHUNK)
    py = ty + (p_idx // TILE).astype(jnp.float32)

    out_ref[...] = jnp.zeros((1, TILE_PIXELS, OUT_PAD), jnp.float32)
    out_ref[0, :, 3:4] = jnp.ones((TILE_PIXELS, 1), jnp.float32)  # t_final

    def dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            inst_hbm.at[pl.ds((row0 + chunk_idx) * REC, REC)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(num_chunks > 0)
    def _():
        dma(0, 0).start()

        def cond(state):
            i, t_row, done = state
            return (i < num_chunks) & jnp.logical_not(done)

        def body(state):
            i, t_row, _ = state
            # static-index double buffering (Mosaic cannot dynamic-slice
            # the VMEM scratch)
            is_even = jax.lax.rem(i, 2) == 0

            @pl.when((i + 1 < num_chunks) & is_even)
            def _():
                dma(1, i + 1).start()

            @pl.when((i + 1 < num_chunks) & jnp.logical_not(is_even))
            def _():
                dma(0, i + 1).start()

            @pl.when(is_even)
            def _():
                dma(0, i).wait()

            @pl.when(jnp.logical_not(is_even))
            def _():
                dma(1, i).wait()

            rec = jax.lax.cond(is_even, lambda: buf[0], lambda: buf[1])
            mean_x = rec[0:1, :]  # (1, CHUNK) broadcasts over sublanes
            mean_y = rec[1:2, :]
            ca = rec[2:3, :]
            cb = rec[3:4, :]
            cc = rec[4:5, :]
            op = rec[5:6, :]
            rgb_t = rec[6:9, :]  # (3, CHUNK)

            dx = mean_x - px  # (256, CHUNK)
            dy = mean_y - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            a = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
            u = 1.0 - a
            # Hillis-Steele inclusive cumprod along the instance lanes
            cp = u
            k = 1
            while k < CHUNK:
                cp = cp * jnp.concatenate(
                    [jnp.ones((TILE_PIXELS, k), jnp.float32), cp[:, :-k]], axis=1
                )
                k *= 2
            s = t_row * cp  # FULL running product (the latch carrier)
            include = (s >= TRANSMITTANCE_EPS) & (a > 0.0)
            cp_prev = jnp.concatenate(
                [jnp.ones((TILE_PIXELS, 1), jnp.float32), cp[:, :-1]], axis=1
            )
            w = jnp.where(include, t_row * cp_prev * a, 0.0)  # (256, CHUNK)
            # color += w @ rgb^T : contract instance lanes on the MXU
            out_ref[0, :, 0:3] += jax.lax.dot_general(
                w, rgb_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            # background transmittance = last surviving inclusive product
            tf_val = jnp.min(jnp.where(include, s, 1.0), axis=1, keepdims=True)
            out_ref[0, :, 3:4] = jnp.minimum(out_ref[0, :, 3:4], tf_val)
            # last contributor position (unpadded sorted order, +1);
            # positions < 2^24 are exact in f32
            pos = (tstart + i * CHUNK + lane + 1).astype(jnp.float32)
            lastc_val = jnp.max(
                jnp.where(include, pos, 0.0), axis=1, keepdims=True
            )
            out_ref[0, :, 4:5] = jnp.maximum(out_ref[0, :, 4:5], lastc_val)
            # carry the FULL product: once below eps it can never recover
            # (u <= 1) — exactly the CUDA done-latch
            t_new = s[:, CHUNK - 1 : CHUNK]  # (256, 1)
            done_now = jnp.all(t_new < TRANSMITTANCE_EPS)
            return i + 1, t_new, done_now

        init_t = jnp.ones((TILE_PIXELS, 1), jnp.float32)
        i_end, _, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), init_t, False)
        )

        # Early exit leaves the prefetched next chunk's DMA in flight —
        # drain it or the semaphore corrupts the next grid step.
        pending = i_end < num_chunks
        even_pending = jax.lax.rem(i_end, 2) == 0

        @pl.when(pending & even_pending)
        def _():
            dma(0, i_end).wait()

        @pl.when(pending & jnp.logical_not(even_pending))
        def _():
            dma(1, i_end).wait()


def forward_pallas(
    packed, chunk_row_start, n_chunks, tile_start, num_tiles, tiles_x,
    interpret=False,
):
    """Returns (colors (T,256,3), t_final (T,256), last_contrib (T,256))."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, TILE_PIXELS, OUT_PAD), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, REC, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (out,) = pl.pallas_call(
        _forward_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, TILE_PIXELS, OUT_PAD), jnp.float32),
        ],
        interpret=interpret,
    )(
        chunk_row_start, n_chunks, tile_start,
        jnp.asarray([tiles_x], jnp.int32), packed,
    )
    return out[:, :, 0:3], out[:, :, 3], out[:, :, 4].astype(jnp.int32)


def tile_ranges(tile_sorted: jnp.ndarray, num_tiles: int):
    """Per-tile [start, end) ranges in the sorted instance array."""
    tiles = jnp.arange(num_tiles, dtype=tile_sorted.dtype)
    start = jnp.searchsorted(tile_sorted, tiles, side="left").astype(jnp.int32)
    end = jnp.searchsorted(tile_sorted, tiles, side="right").astype(jnp.int32)
    return start, end


# ------------------------------------------------------------- backward

GREC = 16  # gradient record rows: [g_mx, g_my, g_ca, g_cb, g_cc, g_op,
           #                        g_r, g_g, g_b, 0...]


def _backward_kernel(
    # scalar prefetch
    chunk_row_ref, n_chunks_ref, tile_start_ref, tiles_x_ref, bg_ref,
    # inputs
    inst_hbm,  # (R*REC, CHUNK) ANY
    grad_init_hbm,  # (R*GREC, CHUNK) ANY — pre-zeroed, aliased to output
    tfinal_ref,  # (1, 256, 1) VMEM
    lastc_ref,  # (1, 256, 1) int32 VMEM
    dc_ref,  # (1, 256, 3) VMEM (cotangent image, tile layout)
    # outputs
    grad_hbm,  # (R*GREC, CHUNK) ANY — per-instance gradient records
    # scratch
    buf,  # (2, REC, CHUNK)
    gbuf,  # (GREC, CHUNK)
    sems,  # (3,) DMA semaphores (2 in + 1 out)
):
    del grad_init_hbm  # aliased storage; only written through grad_hbm
    t = pl.program_id(0)
    row0 = chunk_row_ref[t]
    num_chunks = n_chunks_ref[t]
    tstart = tile_start_ref[t]
    tiles_x = tiles_x_ref[0]

    p_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIXELS, CHUNK), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIXELS, CHUNK), 1)
    tx = ((t % tiles_x) * TILE).astype(jnp.float32)
    ty = ((t // tiles_x) * TILE).astype(jnp.float32)
    px = tx + jax.lax.rem(p_idx, TILE).astype(jnp.float32)
    py = ty + (p_idx // TILE).astype(jnp.float32)

    tf = tfinal_ref[0]  # (256, 1)
    lastc = lastc_ref[0]  # (256, 1)
    dc = dc_ref[0]  # (256, 3)

    # skip chunks entirely past the last contributor of any pixel
    max_lc = jnp.max(lastc)  # position+1 in unpadded sorted order
    hi = jnp.clip(
        (max_lc - tstart + CHUNK - 1) // CHUNK, 0, num_chunks
    )

    def dma_in(slot, chunk_idx):
        return pltpu.make_async_copy(
            inst_hbm.at[pl.ds((row0 + chunk_idx) * REC, REC)],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(hi > 0)
    def _():
        dma_in(0, hi - 1).start()

        def body(k, carry):
            r_carry, s_carry = carry  # (256,1), (256,3)
            i = hi - 1 - k  # chunk index, reverse order
            is_even = jax.lax.rem(k, 2) == 0

            @pl.when((k + 1 < hi) & is_even)
            def _():
                dma_in(1, i - 1).start()

            @pl.when((k + 1 < hi) & jnp.logical_not(is_even))
            def _():
                dma_in(0, i - 1).start()

            @pl.when(is_even)
            def _():
                dma_in(0, i).wait()

            @pl.when(jnp.logical_not(is_even))
            def _():
                dma_in(1, i).wait()

            rec = jax.lax.cond(is_even, lambda: buf[0], lambda: buf[1])
            mean_x = rec[0:1, :]
            mean_y = rec[1:2, :]
            ca = rec[2:3, :]
            cb = rec[3:4, :]
            cc = rec[4:5, :]
            op = rec[5:6, :]
            rgb_t = rec[6:9, :]  # (3, CHUNK)

            dx = mean_x - px
            dy = mean_y - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            q = op * jnp.exp(power)
            alpha = jnp.minimum(ALPHA_MAX, q)
            a = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)

            pos = tstart + i * CHUNK + lane  # 0-based sorted position
            contrib = (pos < lastc) & (a > 0.0)
            u = jnp.where(contrib, 1.0 - a, 1.0)
            a_c = jnp.where(contrib, a, 0.0)

            # reverse inclusive cumprod along lanes: prod_{j>=i} u_j
            cp = u
            kk = 1
            while kk < CHUNK:
                cp = cp * jnp.concatenate(
                    [cp[:, kk:], jnp.ones((TILE_PIXELS, kk), jnp.float32)],
                    axis=1,
                )
                kk *= 2
            r = cp * r_carry  # (256, CHUNK)
            t_before = tf / r  # T_i
            w = t_before * a_c

            # suffix color sum: sum_{j>i} w_j c_j + (carried suffix)
            wc0 = w * rgb_t[0:1, :]
            wc1 = w * rgb_t[1:2, :]
            wc2 = w * rgb_t[2:3, :]

            def rev_incl_sum(x):
                kk = 1
                while kk < CHUNK:
                    x = x + jnp.concatenate(
                        [x[:, kk:], jnp.zeros((TILE_PIXELS, kk), jnp.float32)],
                        axis=1,
                    )
                    kk *= 2
                return x

            ri0, ri1, ri2 = rev_incl_sum(wc0), rev_incl_sum(wc1), rev_incl_sum(wc2)
            suf0 = ri0 - wc0 + s_carry[:, 0:1]
            suf1 = ri1 - wc1 + s_carry[:, 1:2]
            suf2 = ri2 - wc2 + s_carry[:, 2:3]

            # dL/da = dC . (T_i c_i - suffix_i / u_i)
            dc_dot_c = jax.lax.dot_general(
                dc, rgb_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (256, CHUNK)
            dc_dot_suf = (
                dc[:, 0:1] * suf0 + dc[:, 1:2] * suf1 + dc[:, 2:3] * suf2
            )
            g_alpha = jnp.where(
                contrib, t_before * dc_dot_c - dc_dot_suf / u, 0.0
            )

            not_clamped = q < ALPHA_MAX
            g_q = jnp.where(not_clamped, g_alpha, 0.0)
            g_power = q * g_q
            g_op_pix = jnp.exp(power) * g_q

            gbuf[0:1, :] = jnp.sum(-(ca * dx + cb * dy) * g_power, axis=0, keepdims=True)
            gbuf[1:2, :] = jnp.sum(-(cc * dy + cb * dx) * g_power, axis=0, keepdims=True)
            gbuf[2:3, :] = jnp.sum(-0.5 * dx * dx * g_power, axis=0, keepdims=True)
            gbuf[3:4, :] = jnp.sum(-dx * dy * g_power, axis=0, keepdims=True)
            gbuf[4:5, :] = jnp.sum(-0.5 * dy * dy * g_power, axis=0, keepdims=True)
            gbuf[5:6, :] = jnp.sum(g_op_pix, axis=0, keepdims=True)
            # g_rgb: (3, CHUNK) = dC^T w on the MXU
            gbuf[6:9, :] = jax.lax.dot_general(
                dc, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            gbuf[9:GREC, :] = jnp.zeros((GREC - 9, CHUNK), jnp.float32)

            out_dma = pltpu.make_async_copy(
                gbuf, grad_hbm.at[pl.ds((row0 + i) * GREC, GREC)], sems.at[2]
            )
            out_dma.start()
            out_dma.wait()

            new_r = r[:, 0:1]
            new_s = jnp.concatenate(
                [
                    ri0[:, 0:1] + s_carry[:, 0:1],
                    ri1[:, 0:1] + s_carry[:, 1:2],
                    ri2[:, 0:1] + s_carry[:, 2:3],
                ],
                axis=1,
            )
            return new_r, new_s

        # SMEM only yields scalar loads — build the bg row element-wise
        init = (
            jnp.ones((TILE_PIXELS, 1), jnp.float32),
            jnp.concatenate(
                [tf * bg_ref[0], tf * bg_ref[1], tf * bg_ref[2]], axis=1
            ),
        )
        jax.lax.fori_loop(0, hi, body, init)


def backward_pallas(
    packed, grad_init, chunk_row_start, n_chunks, tile_start, bg,
    t_final, last_contrib, d_tiles, num_tiles, tiles_x, interpret=False,
):
    """Per-instance gradient records for the padded chunk layout.

    d_tiles: (T, 256, 3) cotangent in tile layout; t_final/last_contrib
    are the forward's per-pixel records. Returns (R*GREC, CHUNK).
    """
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, TILE_PIXELS, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_PIXELS, 1), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_PIXELS, 3), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, REC, CHUNK), jnp.float32),
            pltpu.VMEM((GREC, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    rows = packed.shape[0] // REC
    return pl.pallas_call(
        _backward_kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows * GREC, CHUNK), jnp.float32)],
        input_output_aliases={6: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        chunk_row_start, n_chunks, tile_start,
        jnp.asarray([tiles_x], jnp.int32), bg.astype(jnp.float32),
        packed, grad_init,
        t_final[:, :, None].astype(jnp.float32),
        last_contrib[:, :, None].astype(jnp.int32),
        d_tiles.astype(jnp.float32),
    )[0]
