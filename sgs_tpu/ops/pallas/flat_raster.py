"""Flat Pallas TPU kernels for tiled Gaussian compositing.

The hot loop of the framework: the TPU-native equivalent of the CUDA
rasterizer's per-tile forward/backward walks (reference upstream
diff-gaussian-rasterization forward.cu/backward.cu; call-site contract at
/root/reference/gaussian_renderer/__init__.py:51-100).

Round-1 lesson: a per-tile grid (8160 steps at 1080p) with manually
double-buffered DMA pays a ~4-5 us fixed cost per grid step — ~36 ms of
the 50 ms forward. This design is FLAT instead:

  * instances are chunk-padded per tile into (R, REC, CHUNK) records
    (CHUNK=128 instance lanes, REC=16 attribute sublanes) — rows are
    tile-major, each row belongs to exactly one tile;
  * ONE grid walks blocks of KROWS rows; Mosaic's standard BlockSpec
    pipeline streams the row blocks through VMEM (no hand-rolled DMA,
    no per-tile scalar setup);
  * per-pixel compositing state (color, running transmittance, final-T,
    last contributor) lives in a VMEM scratch that persists across grid
    steps and is reset at each tile's first row — the sequential-carry
    trick, valid because the TPU grid executes in order on one core;
  * every row writes the tile's running state to its own output slot;
    XLA then picks each tile's LAST row — a T-sized row gather — as the
    tile's final state.  Same trick backwards: suffix carries reset at
    each tile's last row, walking the grid in reverse via the index_map.

Early termination: the carried running product is the FULL product of
(1 - alpha) over the tile's instances so far (not just included ones).
Since u <= 1 it is monotone non-increasing, so "include iff the running
product stays >= 1e-4" reproduces the CUDA test-before-composite latch
exactly, and rows whose every pixel is saturated skip their VPU work
(their DMA is pipelined and effectively free).

Layout notes (Mosaic): pixels on sublanes (256), instance lanes on
lanes (128); in-chunk ordering via Hillis-Steele doubling (no cumprod
primitive); color accumulation is a (256, CHUNK) x (CHUNK, 3) MXU
contraction; per-row scalars (tile id, first/last flags) arrive via
scalar prefetch and the tile-indexed backward inputs are pre-expanded to
per-row copies so every block fetch is static.
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
REC = 16  # attribute sublanes per row (9 used)
CHUNK = 128  # instance lanes per row
KROWS = 8  # rows per grid step
OUT_COLS = 8  # per-pixel state lanes: [r,g,b, t_run, t_final, last_contrib, 0,0]
GREC = 16  # gradient record sublanes: [g_mx,g_my,g_ca,g_cb,g_cc,g_op,g_r,g_g,g_b,0..]

_HI = jax.lax.Precision.HIGHEST


def num_rows(max_instances: int, num_tiles: int) -> int:
    """Worst-case chunk rows: every tile's range padded to a chunk
    boundary, rounded up to a whole number of grid steps."""
    r = max_instances // CHUNK + num_tiles
    return -(-r // KROWS) * KROWS


def pack_rows(attr_sorted, tile_sorted, num_tiles, max_rows):
    """Chunk-pad the tile-sorted instance list into per-row records.

    attr_sorted: (M+1, REC) attribute records in TILE-SORTED instance
      order (attr column 9 carries the ORIGINAL gaussian id as f32) with
      a zero sentinel row at index M — dead lanes point there, so their
      opacity is 0 and they never composite and their id is the dead key.
    tile_sorted: (M,) tile ids, sorted (stable, so per-tile depth order
      is preserved).

    The slot -> instance map is affine per row, so the only instance-
    scale op here is ONE wide (R*CHUNK, REC) row gather — round 2 lesson:
    vmap(dynamic_slice) lowers to a 20k-iteration serial while loop
    (~16 ms) and scalar gathers cost ~6x a row gather of 16x the bytes.

    Returns (packed (max_rows*REC, CHUNK) f32,
             windows (max_rows, CHUNK) int32 original gaussian ids,
             row_tile (max_rows,) int32 (num_tiles = dead row),
             row_first / row_last (max_rows,) int32 tile-boundary flags,
             chunk_row_start (T,), n_chunks (T,)).
    """
    m = tile_sorted.shape[0]
    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tiles, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tiles, side="right").astype(jnp.int32)
    counts = tile_end - tile_start
    n_chunks = -(-counts // CHUNK)
    chunk_row_start = (jnp.cumsum(n_chunks) - n_chunks).astype(jnp.int32)
    rows_used = chunk_row_start[-1] + n_chunks[-1]

    rowv = jnp.arange(max_rows, dtype=jnp.int32)
    row_tile_c = jnp.clip(
        jnp.searchsorted(chunk_row_start, rowv, side="right").astype(jnp.int32) - 1,
        0, num_tiles - 1,
    )
    row_valid = rowv < rows_used
    row_first = row_valid & (rowv == chunk_row_start[row_tile_c])
    row_last = row_valid & (
        rowv == chunk_row_start[row_tile_c] + n_chunks[row_tile_c] - 1
    )
    starts = tile_start[row_tile_c] + (rowv - chunk_row_start[row_tile_c]) * CHUNK

    lanes = jnp.arange(CHUNK, dtype=jnp.int32)
    src = starts[:, None] + lanes[None, :]
    live = row_valid[:, None] & (src < tile_end[row_tile_c][:, None])
    src = jnp.where(live, src, m)  # m -> sentinel record

    rows = attr_sorted[src]  # (R, CHUNK, REC) single wide row-gather
    windows = rows[:, :, 9].astype(jnp.int32)
    packed = rows.transpose(0, 2, 1).reshape(max_rows * REC, CHUNK)
    # dead (padding) rows carry the sentinel tile id so the kernels skip
    # their VPU work entirely
    row_tile = jnp.where(row_valid, row_tile_c, num_tiles)
    return (
        packed,
        windows,
        row_tile,
        row_first.astype(jnp.int32),
        row_last.astype(jnp.int32),
        chunk_row_start,
        n_chunks,
    )


# ---------------------------------------------------------------- forward


def _fwd_kernel(
    # scalar prefetch
    row_tile_ref, row_first_ref, meta_ref,  # meta: [tiles_x, num_tiles]
    # inputs (auto-pipelined blocks)
    packed_ref,  # (KROWS*REC, CHUNK)
    # outputs
    out_ref,  # (KROWS, 256, OUT_COLS)
    # scratch: per-pixel running state, persists across grid steps
    state,  # (256, OUT_COLS) VMEM
):
    k = pl.program_id(0)
    tiles_x = meta_ref[0]
    num_tiles = meta_ref[1]
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIXELS, CHUNK), 0)
    lane_f = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_PIXELS, CHUNK), 1
    ).astype(jnp.float32)
    lx = jax.lax.rem(p_idx, TILE).astype(jnp.float32)
    ly = (p_idx // TILE).astype(jnp.float32)

    for j in range(KROWS):
        r = k * KROWS + j
        t = row_tile_ref[r]
        px = (jax.lax.rem(t, tiles_x) * TILE).astype(jnp.float32) + lx
        py = ((t // tiles_x) * TILE).astype(jnp.float32) + ly

        @pl.when(row_first_ref[r] == 1)
        def _():
            state[:, 0:3] = jnp.zeros((TILE_PIXELS, 3), jnp.float32)
            state[:, 3:6] = jnp.concatenate(
                [
                    jnp.ones((TILE_PIXELS, 2), jnp.float32),  # t_run, t_final
                    jnp.zeros((TILE_PIXELS, 1), jnp.float32),  # last_contrib
                ],
                axis=1,
            )

        t_row = state[:, 3:4]

        # skip saturated rows (the CUDA done-latch, chunk-granular) and
        # dead padding rows (sentinel tile id)
        @pl.when((t < num_tiles) & jnp.any(t_row >= TRANSMITTANCE_EPS))
        def _():
            rec = packed_ref[j * REC:(j + 1) * REC, :]
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
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            a = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
            u = 1.0 - a
            # Hillis-Steele inclusive cumprod along the instance lanes
            cp = u
            kk = 1
            while kk < CHUNK:
                cp = cp * jnp.concatenate(
                    [jnp.ones((TILE_PIXELS, kk), jnp.float32), cp[:, :-kk]],
                    axis=1,
                )
                kk *= 2
            s = t_row * cp  # FULL running product — the latch carrier
            include = (s >= TRANSMITTANCE_EPS) & (a > 0.0)
            cp_prev = jnp.concatenate(
                [jnp.ones((TILE_PIXELS, 1), jnp.float32), cp[:, :-1]], axis=1
            )
            w = jnp.where(include, t_row * cp_prev * a, 0.0)
            state[:, 0:3] += jax.lax.dot_general(
                w, rgb_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )
            tf_val = jnp.min(jnp.where(include, s, 1.0), axis=1, keepdims=True)
            # padded-slot position + 1 (exact in f32 below 2^24 slots)
            pos = (r * CHUNK).astype(jnp.float32) + lane_f + 1.0
            lastc_val = jnp.max(jnp.where(include, pos, 0.0), axis=1, keepdims=True)
            state[:, 4:6] = jnp.concatenate(
                [
                    jnp.minimum(state[:, 4:5], tf_val),
                    jnp.maximum(state[:, 5:6], lastc_val),
                ],
                axis=1,
            )
            state[:, 3:4] = s[:, CHUNK - 1: CHUNK]

        out_ref[j] = state[...]


def forward_flat(
    packed, row_tile, row_first, chunk_row_start, n_chunks,
    num_tiles, tiles_x, interpret=False,
):
    """Returns (colors (T,256,3), t_final (T,256), last_contrib (T,256) f32
    padded-slot positions)."""
    max_rows = packed.shape[0] // REC
    grid = max_rows // KROWS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((KROWS * REC, CHUNK), lambda k, *_: (k, 0)),
        ],
        out_specs=[
            pl.BlockSpec((KROWS, TILE_PIXELS, OUT_COLS), lambda k, *_: (k, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((TILE_PIXELS, OUT_COLS), jnp.float32)],
    )
    (rows_out,) = pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((max_rows, TILE_PIXELS, OUT_COLS), jnp.float32)
        ],
        interpret=interpret,
    )(
        row_tile, row_first,
        jnp.asarray([tiles_x, num_tiles], jnp.int32), packed,
    )
    # each tile's final state lives at its LAST row
    last_row = jnp.clip(chunk_row_start + n_chunks - 1, 0, max_rows - 1)
    final = rows_out[last_row]  # (T, 256, OUT_COLS) row gather
    empty = (n_chunks == 0)[:, None]
    colors = jnp.where(empty[..., None], 0.0, final[:, :, 0:3])
    t_final = jnp.where(empty, 1.0, final[:, :, 4])
    last_contrib = jnp.where(empty, 0.0, final[:, :, 5])
    return colors, t_final, last_contrib


# ---------------------------------------------------------------- backward


def _bwd_kernel(
    # scalar prefetch
    row_tile_ref, row_last_ref, meta_ref, bg_ref,  # meta: [tiles_x, num_tiles]
    # inputs (blocks walked in reverse)
    packed_ref,  # (KROWS*REC, CHUNK)
    tfl_ref,  # (KROWS, 256, 2): [t_final, last_contrib]
    dc_ref,  # (KROWS, 256, 3) cotangent image rows
    # outputs
    grad_ref,  # (KROWS*GREC, CHUNK)
    # scratch: suffix carries, persist across grid steps
    carry,  # (256, 4): [r_suffix, s_r, s_g, s_b]
):
    k = pl.program_id(0)
    nb = pl.num_programs(0)
    b = nb - 1 - k
    tiles_x = meta_ref[0]
    num_tiles = meta_ref[1]
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIXELS, CHUNK), 0)
    lane_f = jax.lax.broadcasted_iota(
        jnp.int32, (TILE_PIXELS, CHUNK), 1
    ).astype(jnp.float32)
    lx = jax.lax.rem(p_idx, TILE).astype(jnp.float32)
    ly = (p_idx // TILE).astype(jnp.float32)
    lanes_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    lanes_j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    tri = (lanes_i >= lanes_j).astype(jnp.float32)

    for jj in range(KROWS):
        j = KROWS - 1 - jj
        r = b * KROWS + j
        t = row_tile_ref[r]
        px = (jax.lax.rem(t, tiles_x) * TILE).astype(jnp.float32) + lx
        py = ((t // tiles_x) * TILE).astype(jnp.float32) + ly
        tf = tfl_ref[j, :, 0:1]  # (256, 1)
        lastc = tfl_ref[j, :, 1:2]
        dc = dc_ref[j]  # (256, 3)

        @pl.when(row_last_ref[r] == 1)
        def _():
            carry[:, 0:1] = jnp.ones((TILE_PIXELS, 1), jnp.float32)
            carry[:, 1:4] = jnp.concatenate(
                [tf * bg_ref[0], tf * bg_ref[1], tf * bg_ref[2]], axis=1
            )

        grad_ref[j * GREC:(j + 1) * GREC, :] = jnp.zeros(
            (GREC, CHUNK), jnp.float32
        )

        # rows entirely past the tile's last contributor have zero grads
        # and unchanged carries (their u == 1, w == 0): skip the VPU work,
        # as for dead padding rows (sentinel tile id)
        row_pos0 = (r * CHUNK).astype(jnp.float32)

        @pl.when((t < num_tiles) & (jnp.max(lastc) > row_pos0))
        def _():
            r_old = carry[:, 0:1]
            s_old = carry[:, 1:4]

            rec = packed_ref[j * REC:(j + 1) * REC, :]
            mean_x = rec[0:1, :]
            mean_y = rec[1:2, :]
            ca = rec[2:3, :]
            cb = rec[3:4, :]
            cc = rec[4:5, :]
            op = rec[5:6, :]
            rgb_t = rec[6:9, :]

            dx = mean_x - px
            dy = mean_y - py
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            q = op * jnp.exp(power)
            alpha = jnp.minimum(ALPHA_MAX, q)
            a = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)

            pos = row_pos0 + lane_f  # 0-based padded-slot position
            contrib = (pos < lastc) & (a > 0.0)
            u = jnp.where(contrib, 1.0 - a, 1.0)
            a_c = jnp.where(contrib, a, 0.0)

            # reverse inclusive cumprod along lanes: prod_{j' >= j} u_j'
            cp = u
            kk = 1
            while kk < CHUNK:
                cp = cp * jnp.concatenate(
                    [cp[:, kk:], jnp.ones((TILE_PIXELS, kk), jnp.float32)],
                    axis=1,
                )
                kk *= 2
            r_full = cp * r_old
            t_before = tf / r_full  # T_i
            w = t_before * a_c

            # dL/da_i = dC . (T_i c_i - suffix_i / u_i) where suffix_i is
            # the per-color sum over forward-later instances. Since dC is
            # constant across lanes, dC.suffix_i = reverse-cumsum over
            # lanes of (w_j * dC.c_j) + dC.carry — collapsing the previous
            # per-color (768,128)x(128,128) tri contraction to ONE
            # (256,128)x(128,128); the per-color suffixes are only needed
            # for the carry, a cheap (256,128)x(128,3) row total.
            dc_dot_c = jax.lax.dot_general(
                dc, rgb_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )
            wcd = w * dc_dot_c  # (256, CHUNK): w_j * dC.c_j
            ri = jax.lax.dot_general(
                wcd, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )  # reverse inclusive cumsum of wcd along lanes
            dc_dot_sold = (
                dc[:, 0:1] * s_old[:, 0:1]
                + dc[:, 1:2] * s_old[:, 1:2]
                + dc[:, 2:3] * s_old[:, 2:3]
            )
            dc_dot_suf = ri - wcd + dc_dot_sold
            g_alpha = jnp.where(
                contrib, t_before * dc_dot_c - dc_dot_suf / u, 0.0
            )

            not_clamped = q < ALPHA_MAX
            g_q = jnp.where(not_clamped, g_alpha, 0.0)
            g_power = q * g_q
            g_op_pix = jnp.exp(power) * g_q

            base = j * GREC
            grad_ref[base + 0: base + 1, :] = jnp.sum(
                -(ca * dx + cb * dy) * g_power, axis=0, keepdims=True
            )
            grad_ref[base + 1: base + 2, :] = jnp.sum(
                -(cc * dy + cb * dx) * g_power, axis=0, keepdims=True
            )
            grad_ref[base + 2: base + 3, :] = jnp.sum(
                -0.5 * dx * dx * g_power, axis=0, keepdims=True
            )
            grad_ref[base + 3: base + 4, :] = jnp.sum(
                -dx * dy * g_power, axis=0, keepdims=True
            )
            grad_ref[base + 4: base + 5, :] = jnp.sum(
                -0.5 * dy * dy * g_power, axis=0, keepdims=True
            )
            grad_ref[base + 5: base + 6, :] = jnp.sum(
                g_op_pix, axis=0, keepdims=True
            )
            grad_ref[base + 6: base + 9, :] = jax.lax.dot_general(
                dc, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )

            # per-color carry: total wc row sum (one (256,C)x(C,3) MXU op)
            wc_tot = jax.lax.dot_general(
                w, rgb_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )  # (256, 3)
            carry[:, 0:1] = r_full[:, 0:1]
            carry[:, 1:4] = wc_tot + s_old


def backward_flat(
    packed, row_tile, row_last, bg, tfl_rows, dc_rows, tiles_x, num_tiles,
    interpret=False,
):
    """Per-slot gradient records for the padded row layout.

    tfl_rows: (R, 256, 2) per-row copies of [t_final, last_contrib];
    dc_rows: (R, 256, 3) per-row copies of the tile-layout cotangent.
    Returns (R*GREC, CHUNK) f32.
    """
    max_rows = packed.shape[0] // REC
    grid = max_rows // KROWS
    nb = grid
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((KROWS * REC, CHUNK), lambda k, *_: (nb - 1 - k, 0)),
            pl.BlockSpec(
                (KROWS, TILE_PIXELS, 2), lambda k, *_: (nb - 1 - k, 0, 0)
            ),
            pl.BlockSpec(
                (KROWS, TILE_PIXELS, 3), lambda k, *_: (nb - 1 - k, 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec((KROWS * GREC, CHUNK), lambda k, *_: (nb - 1 - k, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((TILE_PIXELS, 4), jnp.float32)],
    )
    (grads,) = pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((max_rows * GREC, CHUNK), jnp.float32)
        ],
        interpret=interpret,
    )(
        row_tile, row_last, jnp.asarray([tiles_x, num_tiles], jnp.int32),
        bg.astype(jnp.float32), packed, tfl_rows, dc_rows,
    )
    return grads


def reduce_grads(padgrad, windows, n):
    """Per-slot gradient records -> per-ORIGINAL-GAUSSIAN (n, 9) sums.

    ONE direct unsorted scatter-add. Device-measured at 2.6M slots /
    100k gaussians (scripts/exp_reduce.py): direct segment_sum 45 ms =
    variadic 10-array sort + sorted segment_sum 46 ms; the round-2
    interim "2-array sort + wide row gather + sorted segment_sum" was
    95 ms — the sorted-order (slots, 16) row gather alone costs ~70 ms
    (fully random 64 B rows), dwarfing what the sort saves on the
    scatter side. Dead lanes carry key >= n and drop. windows holds
    ORIGINAL gaussian ids (no inverse-permutation pass needed).
    """
    max_rows = padgrad.shape[0] // GREC
    slots = max_rows * CHUNK
    rows = padgrad.reshape(max_rows, GREC, CHUNK).transpose(0, 2, 1)
    flat = rows.reshape(slots, GREC)
    keys = windows.reshape(slots)
    vals = jnp.where((keys < n)[:, None], flat[:, :9], 0.0)
    return jax.ops.segment_sum(
        vals, jnp.minimum(keys, n - 1), num_segments=n
    )
