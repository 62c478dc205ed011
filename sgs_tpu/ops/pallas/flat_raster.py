"""Flat Pallas TPU kernels for tiled Gaussian compositing.

The hot loop of the framework: the TPU-native equivalent of the CUDA
rasterizer's per-tile forward/backward walks (reference upstream
diff-gaussian-rasterization forward.cu/backward.cu; call-site contract at
/root/reference/gaussian_renderer/__init__.py:51-100).

Design history (each step device-trace-measured at 1080p/1.24M instances):

  round 1: per-tile grid (8160 steps) with hand-rolled DMA — ~4-5 us
    fixed cost per grid step = 36 ms of overhead.
  round 2a: FLAT rows — instances chunk-padded per tile into tile-major
    rows, ONE grid of KROWS-row blocks streamed by Mosaic's standard
    BlockSpec pipeline; per-pixel state persists in VMEM scratch across
    grid steps (sequential-carry, valid because the TPU grid runs in
    order on one core) and resets at tile-first rows.
  round 2b (this file): TRANSPOSED layout — instances on SUBLANES,
    pixels on LANES. The previous (256 pixels, <=8 state cols) layout
    occupied 8/128 lanes, so every compositing/state op ran at ~6% VPU
    width; ablations put the whole compositing block at ~19 ms vs a
    4.5 ms pipeline floor. Transposed, state is (8, 256) full-width and
    the kernel measures 12 ms vs 30 (scripts/exp_transposed.py). The
    packed records become (slots, REC) with NO transposes anywhere:
    pack_rows emits kernel-ready rows and the backward emits
    reduction-ready (slots, GREC) records.

In-chunk depth ordering runs along sublanes: inclusive cumprod via
Hillis-Steele sublane shifts (7 shifted multiplies) — measured FASTER
and bit-exacter than an MXU lower-triangular log-space contraction
(12.1 ms vs 14.6, and exact include tests vs 1e-3 drift).

Early termination: the carried running product is the FULL product of
(1 - alpha) over the tile's instances so far (not just included ones).
Since u <= 1 it is monotone non-increasing, so "include iff the running
product stays >= 1e-4" reproduces the CUDA test-before-composite latch
exactly, and rows whose every pixel is saturated skip their VPU work
(their DMA is pipelined and effectively free).

Per-gaussian gradient reduction (tight path): presort-contiguous
segment sums (reduce_grads_presort) — two split (slots, 8) grad buffers
gathered into depth-rank-major order where each Gaussian's instances
are contiguous, then full-lane-packed cumsum + boundary prefix
differences. ~7 ms where the direct unsorted segment_sum's scatter-add
lowering cost ~35 (scripts/exp_reduce3/4.py, exp_gather_model.py). The
rect path keeps the direct segment_sum (reduce_grads).
"""

from __future__ import annotations

from functools import partial

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
REC = 16  # attribute lanes per instance row (10 used)
CHUNK = 64  # instance sublanes per row: round-3 sweep at 1080p/815k tight
# instances WITH the kernel-row bucket: 128 -> 64 cuts per-tile padding
# (slots 1.70M -> 1.31M; pack gather 10.5 -> 8.1 ms) for +0.9 ms of
# per-row kernel fixed cost (fwd 9.3 -> 10.2) — net -0.7 ms/frame and
# ~25% smaller grad buffers; 32 loses big (kernels 19.8 + 15.6 ms)
KROWS = 8  # rows per grid step
SROWS = 8  # per-pixel state rows: [r,g,b, t_run, t_final, last_contrib, 0,0]
GRECT = 16  # transposed grad-record SUBLANES: the backward emits ONE
# (GRECT, slots) buffer, rows [g_mx,g_my,g_ca,g_cb,g_cc,g_op,g_r,g_g,
# g_b, 0 x7] — compact under the Pallas-forced {1,0} layout. A
# (slots, k) output would lane-pad k -> 128 (512 B/slot for ANY k<=128):
# at 5M Gaussians that is 2 x 8 GB of grad buffers alone (the round-2
# OOM), and ~2 GB of dead write traffic per frame at 100k.
GREC = 8  # gradient record lanes PER REDUCTION BUFFER: the reduction
# gathers from TWO (slots, 8) XLA-side transposes of the kernel output
# — A: rows 0:8 = [g_mx,g_my,g_ca,g_cb,g_cc,g_op,g_r,g_g], B: rows 8:16
# = [g_b, 0 x7] — because the TPU random row-gather cliffs on LOGICAL
# row width: 16-lane rows gather at 22.4 ns/row, 8-lane rows at 4.9,
# independent of source layout (scripts/exp_gather_model.py,
# exp_gather_layout.py).

_HI = jax.lax.Precision.HIGHEST

# Backward moment reductions on the MXU: ALL six lane-moments of
# g_power (vs 1, qx, qy, qx^2, qx*qy, qy^2 in IN-TILE pixel coords) come
# from ONE (CHUNK,256)@(256,6) matmul against a COMPILE-TIME-CONSTANT
# basis, then (CHUNK,1) column math shifts them to instance-centered
# moments. The round-2 attempt that "lost 13.6 -> 18.2 ms" built its
# basis from dx/dy PER ROW (5 wide ops + an MXU-operand relayout per
# row); the in-tile basis hoists all of that out of the loop. Trade-off:
# instance-centered moments via the binomial shift cancel catastrophic-
# ally when |mean - tile| >> in-tile spread, so this stays opt-in until
# parity + device timing say otherwise.
MOMENT_MXU = False


def num_rows(max_instances: int, num_tiles: int) -> int:
    """Worst-case chunk rows: every tile's range padded to a chunk
    boundary, rounded up to a whole number of grid steps."""
    r = max_instances // CHUNK + num_tiles
    return -(-r // KROWS) * KROWS


def row_maps(chunk_row_start, n_chunks, rows_used, num_tiles, max_rows):
    """Kernel row -> tile / tile-first / tile-last maps via
    scatter-at-tile-start + cummax fills (tiles colliding at one
    chunk_row_start are empty except possibly the LARGEST, so max picks
    the owner). Shared by the gather (pack_rows) and aligned
    (pack_aligned) packers."""
    i32 = jnp.int32
    rowv = jnp.arange(max_rows, dtype=i32)

    def rfill(vals):
        marks = jnp.zeros((max_rows,), i32).at[chunk_row_start].max(
            vals.astype(i32), mode="drop"
        )
        return jax.lax.cummax(marks)

    row_tile_c = jnp.clip(
        rfill(jnp.arange(num_tiles, dtype=i32)), 0, num_tiles - 1
    )
    f_crs = rfill(chunk_row_start)  # chunk_row_start of the owning tile
    row_valid = rowv < rows_used
    row_first = row_valid & (rowv == f_crs)
    # the last row of a tile is the one before the next tile's first (or
    # the last used row); a bucket-truncated tile still flags its last
    # PRESENT row so the backward carry init stays well-defined under
    # row overflow (the image is flagged-wrong then anyway).
    # rowv+1 == rows_used handles the final used row when the LAST tile
    # is non-empty: no mark lands at rows_used then, so f_crs[rows_used]
    # is a stale cummax carry (< rows_used) and the next-first test alone
    # misses it — the backward carry for that tile never initializes
    next_crs = jnp.concatenate([f_crs[1:], jnp.full((1,), 2**30, i32)])
    row_last = row_valid & (
        (rowv + 1 == jnp.minimum(next_crs, rows_used))
        | (rowv + 1 == rows_used)
        | (rowv == max_rows - 1)
    )
    row_tile = jnp.where(row_valid, row_tile_c, num_tiles)
    return (
        row_tile, row_first.astype(i32), row_last.astype(i32), f_crs,
        row_valid,
    )


def tile_ranges(tile_sorted, num_tiles):
    """Per-tile [start, end) ranges of a tile-sorted id array, via
    log2(M) unrolled binary-search gathers (the default vmapped
    while-loop searchsorted costs ~8 ms/frame at 8k tiles)."""
    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(
        tile_sorted, tiles, side="left", method="scan_unrolled"
    ).astype(jnp.int32)
    tile_end = jnp.searchsorted(
        tile_sorted, tiles, side="right", method="scan_unrolled"
    ).astype(jnp.int32)
    return tile_start, tile_end


def pack_aligned(tile_id, rowid, num_tiles, max_rows, r_sentinel):
    """CHUNK-align tile ranges INSIDE the sort: the sorted array IS the
    padded slot layout, so the slots-scale pack gather of pack_rows
    disappears (the caller gathers attributes ONCE, straight from the
    R-scale row table) — the round-3 successor to the measured-dead
    windowed-gather and dynamic-DMA routes (PERF_NOTES roadmap 1b).

    tile_id: (M,) UNSORTED instance tile ids (num_tiles = dead), emitted
      depth-rank-major (stable order within a tile = depth order).
    rowid: (M,) level-1 row id per instance, already sentinel-mapped for
      dead instances.

    Mechanics: a first 1-key sort yields per-tile counts (T-scale
    searchsorted); each tile t needs pad_t = n_chunks_t*CHUNK - count_t
    dead entries, laid out in a (T*(CHUNK-1),) padding array by one
    scatter+cummax fill over the cumsum'd pad offsets (colliders at one
    offset are pad-0 tiles except possibly the largest id, which owns
    the run). A second stable 1-key sort over [instances ++ padding]
    then lands every tile block at chunk_row_start[t]*CHUNK exactly:
    stability keeps instances (concatenated first) ahead of their tile's
    padding and preserves depth order. Dead entries sort to the end and
    are cut by the static slice to slots.

    Returns (rowid_padded (slots,) int32 — index into the caller's
    (R+1,)-row attribute table, r_sentinel rows for dead slots via the
    caller's rowid sentinel; inst_padded (slots,) int32 — ORIGINAL
    instance index per slot (padding slots hold m; CULLED instances keep
    their own index but land past rows_used on zero-grad slots), feeding
    slot_of_inst_from_padded; row_tile/row_first/row_last (max_rows,);
    chunk_row_start/n_chunks (T,); rows_used () int32)."""
    i32 = jnp.int32
    m = tile_id.shape[0]
    slots = max_rows * CHUNK
    pad_cap = num_tiles * (CHUNK - 1)

    tile_s = jax.lax.sort(tile_id)
    tile_start, tile_end = tile_ranges(tile_s, num_tiles)
    counts = tile_end - tile_start
    n_chunks = -(-counts // CHUNK)
    chunk_row_start = (jnp.cumsum(n_chunks) - n_chunks).astype(i32)
    rows_used = chunk_row_start[-1] + n_chunks[-1]

    pad_t = n_chunks * CHUNK - counts  # in [0, CHUNK-1]
    p_off = (jnp.cumsum(pad_t) - pad_t).astype(i32)
    pad_total = p_off[-1] + pad_t[-1]
    pidx = jnp.arange(pad_cap, dtype=i32)
    owner = jax.lax.cummax(
        jnp.zeros((pad_cap,), i32).at[p_off].max(
            jnp.arange(num_tiles, dtype=i32), mode="drop"
        )
    )
    pad_tile = jnp.where(pidx < pad_total, owner, num_tiles)

    keys = jnp.concatenate([tile_id, pad_tile])
    rows = jnp.concatenate([rowid, jnp.full((pad_cap,), r_sentinel, i32)])
    insts = jnp.concatenate([jnp.arange(m, dtype=i32), jnp.full((pad_cap,), m, i32)])
    _, rowid_p, inst_p = jax.lax.sort(
        (keys, rows, insts), num_keys=1, is_stable=True
    )
    total_len = m + pad_cap
    if slots <= total_len:
        rowid_padded, inst_padded = rowid_p[:slots], inst_p[:slots]
    else:
        ext = slots - total_len
        rowid_padded = jnp.concatenate(
            [rowid_p, jnp.full((ext,), r_sentinel, i32)]
        )
        inst_padded = jnp.concatenate([inst_p, jnp.full((ext,), m, i32)])

    row_tile, row_first, row_last, _, _ = row_maps(
        chunk_row_start, n_chunks, rows_used, num_tiles, max_rows
    )
    return (
        rowid_padded, inst_padded, row_tile, row_first, row_last,
        chunk_row_start, n_chunks, rows_used,
    )


def slot_of_inst_from_padded(inst_padded, m):
    """Invert the aligned layout's slot -> instance map: ONE cheap
    2-array sort at slots scale (replaces the M-scale fill + sort of
    the removed padded_slot_of_presort). Position p of the result is
    instance p's padded slot when no row-bucket overflow occurred
    (under overflow dropped instances shift the tail — the frame is
    flagged wrong and regrown then anyway). Entries for dead instances
    point at arbitrary dead slots (zero grads) and are never addressed
    by the rank segments. Requires DEAD instances to be a SUFFIX of the
    instance buffer (the expansion's layout): the cut to slots may drop
    dead entries from inst_padded, and only ids larger than every live
    id may go missing without shifting live instances' sorted
    positions (tests/test_pack_aligned.py)."""
    i32 = jnp.int32
    slots = inst_padded.shape[0]
    _, slot_sorted = jax.lax.sort(
        (inst_padded, jnp.arange(slots, dtype=i32)), num_keys=1,
        is_stable=True,
    )
    if slots >= m:
        return slot_sorted[:m]
    return jnp.concatenate(
        [slot_sorted, jnp.full((m - slots,), slots - 1, i32)]
    )


def pack_rows(attr_sorted, tile_sorted, num_tiles, max_rows):
    """Chunk-pad the tile-sorted instance list into kernel-ready rows.

    attr_sorted: (M+1, REC) attribute records in TILE-SORTED instance
      order (attr column 9 carries the ORIGINAL gaussian id as f32) with
      a zero sentinel row at index M — dead lanes point there, so their
      opacity is 0 and they never composite and their id is the dead key.
    tile_sorted: (M,) tile ids, sorted (stable, so per-tile depth order
      is preserved).

    The slot -> instance map is affine per row, so the only instance-
    scale op here is ONE wide (R*CHUNK, REC) row gather whose output is
    ALREADY the kernel layout (instances on sublanes, attributes on
    lanes) — no transpose.

    max_rows may be a BUCKET smaller than the analytic worst case
    (num_rows): rows beyond it are dropped and the returned rows_used
    (traced scalar) lets the caller flag the overflow and regrow.

    Returns (packed (max_rows*CHUNK, REC) f32,
             windows (max_rows, CHUNK) int32 original gaussian ids,
             row_tile (max_rows,) int32 (num_tiles = dead row),
             row_first / row_last (max_rows,) int32 tile-boundary flags,
             chunk_row_start (T,), n_chunks (T,), tile_start (T,),
             rows_used () int32).
    """
    m = tile_sorted.shape[0]
    tile_start, tile_end = tile_ranges(tile_sorted, num_tiles)
    counts = tile_end - tile_start
    n_chunks = -(-counts // CHUNK)
    chunk_row_start = (jnp.cumsum(n_chunks) - n_chunks).astype(jnp.int32)
    rows_used = chunk_row_start[-1] + n_chunks[-1]

    row_tile, row_first, row_last, f_crs, row_valid = row_maps(
        chunk_row_start, n_chunks, rows_used, num_tiles, max_rows
    )

    def rfill(vals):
        marks = jnp.zeros((max_rows,), jnp.int32).at[chunk_row_start].max(
            vals.astype(jnp.int32), mode="drop"
        )
        return jax.lax.cummax(marks)

    rowv = jnp.arange(max_rows, dtype=jnp.int32)
    f_ts = rfill(tile_start)  # tile_start of the owning tile
    f_te = rfill(tile_end)  # tile_end of the owning tile
    starts = f_ts + (rowv - f_crs) * CHUNK

    lanes = jnp.arange(CHUNK, dtype=jnp.int32)
    src = starts[:, None] + lanes[None, :]
    live = row_valid[:, None] & (src < f_te[:, None])
    src = jnp.where(live, src, m)  # m -> sentinel record

    rows = attr_sorted[src]  # (R, CHUNK, REC) single wide row-gather
    windows = rows[:, :, 9].astype(jnp.int32)
    packed = rows.reshape(max_rows * CHUNK, REC)
    return (
        packed,
        windows,
        row_tile,
        row_first,
        row_last,
        chunk_row_start,
        n_chunks,
        tile_start,
        rows_used,
    )


# ---------------------------------------------------------------- forward


def _row_lookup_fwd(crs_ref, nch_ref, tile_ptr, r, num_tiles, max_rows):
    """Owner tile + first/last flags of kernel row r, from the T-scale
    CSR tables and a SEQUENTIALLY-carried tile pointer (SMEM scratch).

    Replaces three (max_rows,) scalar-prefetch row maps: at the 5M
    garden config those were 1.64 MB of SMEM against the 1 MB scoped
    limit (the round-3 compile OOM); the CSR tables are T-scale (~65 KB
    at 1080p) at ANY Gaussian count. The TPU grid runs in order on one
    core, so advancing the pointer forward per row is exact; the total
    advance over a sweep is num_tiles scalar iterations."""
    def cond(t):
        # clamp: cond is also evaluated at t == num_tiles (no short-
        # circuit in traced &) — keep the SMEM read in bounds
        tc = jnp.minimum(t, num_tiles - 1)
        return (t < num_tiles) & (r >= crs_ref[tc] + nch_ref[tc])

    t = jax.lax.while_loop(cond, lambda t: t + 1, tile_ptr[0])
    tile_ptr[0] = t
    rows_used = crs_ref[num_tiles - 1] + nch_ref[num_tiles - 1]
    live = (t < num_tiles) & (r < rows_used)
    t_eff = jnp.where(live, t, num_tiles)
    first = live & (r == crs_ref[jnp.minimum(t, num_tiles - 1)])
    return t_eff, first


def _fwd_kernel_body(
    num_tiles, tiles_x, max_rows,
    # scalar prefetch: T-scale CSR row tables
    crs_ref, nch_ref,
    # inputs (auto-pipelined blocks)
    packed_ref,  # (REC, KROWS*CHUNK) — transposed, compact in HBM
    # outputs
    out_ref,  # (KROWS, SROWS, 256)
    # scratch
    state,  # (SROWS, 256) VMEM: per-pixel running state across steps
    tile_ptr,  # (1,) SMEM: current tile of the forward sweep
):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        tile_ptr[0] = 0

    # pixels on lanes: (1, 256) coordinate rows
    p_idx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIXELS), 1)
    lx = jax.lax.rem(p_idx, TILE).astype(jnp.float32)
    ly = (p_idx // TILE).astype(jnp.float32)
    # in-chunk instance index on sublanes: (CHUNK, 1)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0).astype(jnp.float32)

    for j in range(KROWS):
        r = k * KROWS + j
        t, first = _row_lookup_fwd(
            crs_ref, nch_ref, tile_ptr, r, num_tiles, max_rows
        )
        px = (jax.lax.rem(t, tiles_x) * TILE).astype(jnp.float32) + lx
        py = ((t // tiles_x) * TILE).astype(jnp.float32) + ly

        @pl.when(first)
        def _():
            state[0:3, :] = jnp.zeros((3, TILE_PIXELS), jnp.float32)
            state[3:5, :] = jnp.ones((2, TILE_PIXELS), jnp.float32)  # t_run, t_final
            state[5:SROWS, :] = jnp.zeros((SROWS - 5, TILE_PIXELS), jnp.float32)

        t_row = state[3:4, :]  # (1, 256)

        # skip saturated rows (the CUDA done-latch, chunk-granular) and
        # dead padding rows (sentinel tile id)
        @pl.when((t < num_tiles) & jnp.any(t_row >= TRANSMITTANCE_EPS))
        def _():
            # in-register (REC, CHUNK) -> (CHUNK, REC) transpose: the
            # compute wants instances on sublanes; HBM wants the
            # transposed compact layout (see forward_flat docstring)
            rec = jnp.transpose(
                packed_ref[:, j * CHUNK:(j + 1) * CHUNK]
            )  # (CHUNK, REC)
            mean_x = rec[:, 0:1]  # (CHUNK, 1)
            mean_y = rec[:, 1:2]
            ca = rec[:, 2:3]
            cb = rec[:, 3:4]
            cc = rec[:, 4:5]
            op = rec[:, 5:6]
            rgb_t = rec[:, 6:9]  # (CHUNK, 3)

            dx = mean_x - px  # (CHUNK, 256)
            dy = mean_y - py
            # factored quadratic: two column pre-scales save two wide mults
            power = (-0.5 * ca * dx - cb * dy) * dx + (-0.5 * cc) * dy * dy
            alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
            a = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)
            u = 1.0 - a
            # Hillis-Steele inclusive cumprod along the instance sublanes
            cp = u
            kk = 1
            while kk < CHUNK:
                cp = cp * jnp.concatenate(
                    [jnp.ones((kk, TILE_PIXELS), jnp.float32), cp[:-kk, :]],
                    axis=0,
                )
                kk *= 2
            s = t_row * cp  # FULL running product — the latch carrier
            # exclusive product t_row*cp_prev == shifted s (one concat,
            # no second wide multiply)
            s_prev = jnp.concatenate([t_row, s[:-1, :]], axis=0)
            include = (s >= TRANSMITTANCE_EPS) & (a > 0.0)
            w = jnp.where(include, s_prev * a, 0.0)
            state[0:3, :] += jax.lax.dot_general(
                rgb_t, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )  # (3, 256) color accumulation on the MXU
            tf_val = jnp.min(jnp.where(include, s, 1.0), axis=0, keepdims=True)
            # padded-slot position + 1 (exact in f32 below 2^24 slots)
            pos = (r * CHUNK).astype(jnp.float32) + lane_s + 1.0
            lastc_val = jnp.max(jnp.where(include, pos, 0.0), axis=0, keepdims=True)
            state[4:5, :] = jnp.minimum(state[4:5, :], tf_val)
            state[5:6, :] = jnp.maximum(state[5:6, :], lastc_val)
            state[3:4, :] = s[CHUNK - 1: CHUNK, :]

        out_ref[j] = state[...]


def forward_flat(
    packed_t, chunk_row_start, n_chunks,
    num_tiles, tiles_x, interpret=False,
):
    """packed_t: (REC, slots) TRANSPOSED packed records. Pallas forces
    the {1,0} row-major layout on kernel operands, so a (slots, 16)
    operand is lane-padded 16 -> 128 — an 8x HBM expansion (8 GB and an
    OOM at the 5M-Gaussian config, ~1 GB of dead streaming per pass at
    100k). The transposed operand is compact; kernels transpose each
    (REC, CHUNK) row slice back in-register. Row -> tile ownership is
    derived in-kernel from the T-scale CSR tables (see _row_lookup_fwd).

    Returns (colors (T,3,256), t_final (T,256), last_contrib (T,256)
    f32 padded-slot positions)."""
    max_rows = packed_t.shape[1] // CHUNK
    grid = max_rows // KROWS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((REC, KROWS * CHUNK), lambda k, *_: (0, k)),
        ],
        out_specs=[
            pl.BlockSpec((KROWS, SROWS, TILE_PIXELS), lambda k, *_: (k, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((SROWS, TILE_PIXELS), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    (rows_out,) = pl.pallas_call(
        partial(_fwd_kernel_body, num_tiles, tiles_x, max_rows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((max_rows, SROWS, TILE_PIXELS), jnp.float32)
        ],
        interpret=interpret,
    )(
        chunk_row_start.astype(jnp.int32), n_chunks.astype(jnp.int32),
        packed_t,
    )
    # each tile's final state lives at its LAST row
    last_row = jnp.clip(chunk_row_start + n_chunks - 1, 0, max_rows - 1)
    final = rows_out[last_row]  # (T, SROWS, 256) row gather
    empty = (n_chunks == 0)[:, None]
    colors = jnp.where(empty[:, None, :], 0.0, final[:, 0:3, :])
    t_final = jnp.where(empty, 1.0, final[:, 4, :])
    last_contrib = jnp.where(empty, 0.0, final[:, 5, :])
    return colors, t_final, last_contrib


# ---------------------------------------------------------------- backward


def _row_lookup_bwd(crs_ref, nch_ref, tile_ptr, r, num_tiles, max_rows):
    """Reverse-sweep mirror of _row_lookup_fwd: the backward grid walks
    rows in DECREASING r, so the carried tile pointer only ever moves
    down. Owner t satisfies crs[t] <= r (< crs[t] + nch[t] by row
    contiguity: chunk_row_start is the exact cumsum of n_chunks)."""
    def cond(t):
        return (t > 0) & (r < crs_ref[t])

    t = jax.lax.while_loop(cond, lambda t: t - 1, tile_ptr[0])
    tile_ptr[0] = t
    rows_used = crs_ref[num_tiles - 1] + nch_ref[num_tiles - 1]
    live = r < rows_used
    t_eff = jnp.where(live, t, num_tiles)
    # r == max_rows-1: under row-bucket overflow (rows_used > max_rows)
    # the truncated tile's true last row lies beyond the buffer — still
    # initialize the carry at the first processed row so the sweep stays
    # finite (the frame is overflow-flagged and regrown anyway)
    last = live & ((r == crs_ref[t] + nch_ref[t] - 1) | (r == max_rows - 1))
    return t_eff, last


def _bwd_kernel_body(
    num_tiles, tiles_x, max_rows,
    # scalar prefetch: T-scale CSR row tables + background color
    crs_ref, nch_ref, bg_ref,
    # inputs (blocks walked in reverse)
    packed_ref,  # (REC, KROWS*CHUNK) — transposed, compact in HBM
    aux_ref,  # (KROWS, 5, 256): [t_final, last_contrib, dc_r, dc_g, dc_b]
    # outputs: ONE transposed compact grad buffer (see GRECT comment)
    grad_ref,  # (GRECT, KROWS*CHUNK)
    # scratch
    carry,  # (2, 256) VMEM: [r_suffix, dC.s_suffix] across grid steps
    tile_ptr,  # (1,) SMEM: current tile of the reverse sweep
):
    k = pl.program_id(0)
    nb = pl.num_programs(0)
    b = nb - 1 - k

    @pl.when(k == 0)
    def _():
        tile_ptr[0] = num_tiles - 1

    p_idx = jax.lax.broadcasted_iota(jnp.int32, (1, TILE_PIXELS), 1)
    lx = jax.lax.rem(p_idx, TILE).astype(jnp.float32)
    ly = (p_idx // TILE).astype(jnp.float32)
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0).astype(jnp.float32)
    if MOMENT_MXU:
        # constant (6, 256) in-tile moment basis, hoisted out of the
        # row loop (the whole point vs the failed dx/dy-basis variant)
        basis = jnp.concatenate(
            [jnp.ones_like(lx), lx, ly, lx * lx, lx * ly, ly * ly],
            axis=0,
        )

    for jj in range(KROWS):
        j = KROWS - 1 - jj
        r = b * KROWS + j
        t, last = _row_lookup_bwd(
            crs_ref, nch_ref, tile_ptr, r, num_tiles, max_rows
        )
        px = (jax.lax.rem(t, tiles_x) * TILE).astype(jnp.float32) + lx
        py = ((t // tiles_x) * TILE).astype(jnp.float32) + ly
        tf = aux_ref[j, 0:1, :]  # (1, 256)
        lastc = aux_ref[j, 1:2, :]
        dc = aux_ref[j, 2:5, :]  # (3, 256)

        @pl.when(last)
        def _():
            carry[0:1, :] = jnp.ones((1, TILE_PIXELS), jnp.float32)
            # dC . (T_fin * bg): scalar bg per channel
            carry[1:2, :] = tf * (
                dc[0:1, :] * bg_ref[0] + dc[1:2, :] * bg_ref[1]
                + dc[2:3, :] * bg_ref[2]
            )

        # rows entirely past the tile's last contributor have zero grads
        # and unchanged carries (their u == 1, w == 0): skip the VPU work,
        # as for dead padding rows (sentinel tile id)
        row_pos0 = (r * CHUNK).astype(jnp.float32)
        live_row = (t < num_tiles) & (jnp.max(lastc) > row_pos0)

        # zero-fill ONLY skipped rows (the reduction reads dead slots as
        # zeros); live rows write their grads exactly once below — the
        # old unconditional zero-fill doubled the 84 MB grad-stream
        @pl.when(jnp.logical_not(live_row))
        def _():
            grad_ref[:, j * CHUNK:(j + 1) * CHUNK] = jnp.zeros(
                (GRECT, CHUNK), jnp.float32
            )

        @pl.when(live_row)
        def _():
            r_old = carry[0:1, :]  # (1, 256)
            sdc_old = carry[1:2, :]  # (1, 256): dC . suffix carry

            rec = jnp.transpose(
                packed_ref[:, j * CHUNK:(j + 1) * CHUNK]
            )  # (CHUNK, REC)
            mean_x = rec[:, 0:1]
            mean_y = rec[:, 1:2]
            ca = rec[:, 2:3]
            cb = rec[:, 3:4]
            cc = rec[:, 4:5]
            op = rec[:, 5:6]
            rgb_t = rec[:, 6:9]  # (CHUNK, 3)

            dx = mean_x - px
            dy = mean_y - py
            # factored quadratic — must match the forward's association
            # exactly so the include/clamp branches agree bit-for-bit
            power = (-0.5 * ca * dx - cb * dy) * dx + (-0.5 * cc) * dy * dy
            q = op * jnp.exp(power)
            alpha = jnp.minimum(ALPHA_MAX, q)
            a = jnp.where((power <= 0.0) & (alpha >= ALPHA_MIN), alpha, 0.0)

            pos = row_pos0 + lane_s  # 0-based padded-slot position
            contrib = (pos < lastc) & (a > 0.0)
            a_c = jnp.where(contrib, a, 0.0)
            u = 1.0 - a_c  # == 1 exactly where not contrib

            # reverse inclusive cumprod along sublanes: prod_{i' >= i} u_i'
            cp = u
            kk = 1
            while kk < CHUNK:
                cp = cp * jnp.concatenate(
                    [cp[kk:, :], jnp.ones((kk, TILE_PIXELS), jnp.float32)],
                    axis=0,
                )
                kk *= 2
            r_full = cp * r_old
            # ONE reciprocal serves both divisions of the math below:
            # T_i = tf / P_i and suffix_i / u_i = suffix_i * P_{i+1} / P_i
            # (u_i = P_i / P_{i+1} by the reverse-cumprod recurrence), so
            # P_shift = [P_1.., r_old] turns the second divide into mults
            inv_p = 1.0 / r_full
            p_shift = jnp.concatenate([r_full[1:, :], r_old], axis=0)
            t_before = tf * inv_p  # T_i
            w = t_before * a_c  # (CHUNK, 256)

            # dL/da_i = dC . (T_i c_i - suffix_i / u_i); dC is constant
            # across instances so dC.suffix = reverse-cumsum of w*(dC.c)
            # plus the carried dC.suffix (one HS pass, no per-color work)
            dc_dot_c = jax.lax.dot_general(
                rgb_t, dc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )  # (CHUNK, 256)
            wcd = w * dc_dot_c
            ri = wcd
            kk = 1
            while kk < CHUNK:
                ri = ri + jnp.concatenate(
                    [ri[kk:, :], jnp.zeros((kk, TILE_PIXELS), jnp.float32)],
                    axis=0,
                )
                kk *= 2
            dc_dot_suf = ri - wcd + sdc_old
            g_alpha = jnp.where(
                contrib,
                inv_p * (tf * dc_dot_c - dc_dot_suf * p_shift),
                0.0,
            )

            not_clamped = q < ALPHA_MAX
            g_q = jnp.where(not_clamped, g_alpha, 0.0)
            g_power = q * g_q

            base = j * CHUNK
            if MOMENT_MXU:
                # ONE matmul against the constant in-tile basis gives
                # all six raw moments; binomial shift to instance-
                # centered moments in (CHUNK, 1) column math
                mmt = jax.lax.dot_general(
                    g_power, basis, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_HI,
                )  # (CHUNK, 6): [S0, Sqx, Sqy, Sqxx, Sqxy, Sqyy]
                s0 = mmt[:, 0:1]
                sqx = mmt[:, 1:2]
                sqy = mmt[:, 2:3]
                mxl = mean_x - px[0:1, 0:1]  # lx[0] == 0 -> tile x off
                myl = mean_y - py[0:1, 0:1]
                s_x = mxl * s0 - sqx
                s_y = myl * s0 - sqy
                s_xx = mxl * mxl * s0 - 2.0 * mxl * sqx + mmt[:, 3:4]
                s_xy = (mxl * myl * s0 - mxl * sqy - myl * sqx
                        + mmt[:, 4:5])
                s_yy = myl * myl * s0 - 2.0 * myl * sqy + mmt[:, 5:6]
            else:
                # moment factoring: mean/conic grads are linear in the
                # five lane-moments of g_power against (1|dx|dy)^2 with
                # PER-INSTANCE coefficients, so compute the moments once
                # (5 wide mults + 5 reduces) and apply ca/cb/cc in
                # (CHUNK, 1) column math — replaces five separate
                # integrand chains (~17 wide mults) feeding the reduces
                t1 = dx * g_power
                t2 = dy * g_power
                s0 = jnp.sum(g_power, axis=1, keepdims=True)
                s_x = jnp.sum(t1, axis=1, keepdims=True)
                s_y = jnp.sum(t2, axis=1, keepdims=True)
                s_xx = jnp.sum(t1 * dx, axis=1, keepdims=True)
                s_xy = jnp.sum(t1 * dy, axis=1, keepdims=True)
                s_yy = jnp.sum(t2 * dy, axis=1, keepdims=True)
            g_mx = -(ca * s_x + cb * s_y)
            g_my = -(cc * s_y + cb * s_x)
            g_ca = -0.5 * s_xx
            g_cb = -s_xy
            g_cc = -0.5 * s_yy
            # g_op = sum(exp(power) * g_q) = sum(q * g_q) / op: the
            # opacity grad falls out of the S0 moment via the
            # per-instance column divide — no sixth wide integrand
            g_op = s0 / op
            g_rgb = jax.lax.dot_general(
                w, dc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )  # (CHUNK, 3)
            g_all = jnp.concatenate(
                [
                    g_mx, g_my, g_ca, g_cb, g_cc, g_op, g_rgb,
                    jnp.zeros((CHUNK, GRECT - 9), jnp.float32),
                ],
                axis=1,
            )  # (CHUNK, GRECT)
            grad_ref[:, base:base + CHUNK] = jnp.transpose(g_all)

            # carries: total row sums
            carry[0:1, :] = r_full[0:1, :]
            carry[1:2, :] = ri[0:1, :] + sdc_old


def backward_flat(
    packed_t, chunk_row_start, n_chunks, bg, aux_rows, tiles_x, num_tiles,
    interpret=False,
):
    """Per-slot gradient records for the padded row layout.

    packed_t: (REC, slots) transposed records (see forward_flat);
    aux_rows: (R, 5, 256) per-row copies of [t_final, last_contrib,
    dc_r, dc_g, dc_b] — ONE fused operand: separate (R,2,256)+(R,3,256)
    operands each sublane-pad to 8 in the kernel layout (2x the stream)
    and cost two XLA row gathers to build instead of one.
    Row -> tile ownership / tile-last flags come from the T-scale CSR
    tables in-kernel (_row_lookup_bwd) — see _row_lookup_fwd for why.
    Returns ONE (GRECT, slots) f32 buffer — compact under the Pallas
    {1,0} layout (see the GRECT comment).
    """
    max_rows = packed_t.shape[1] // CHUNK
    grid = max_rows // KROWS
    nb = grid
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((REC, KROWS * CHUNK), lambda k, *_: (0, nb - 1 - k)),
            pl.BlockSpec(
                (KROWS, 5, TILE_PIXELS), lambda k, *_: (nb - 1 - k, 0, 0)
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (GRECT, KROWS * CHUNK), lambda k, *_: (0, nb - 1 - k)
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, TILE_PIXELS), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    (grads_t,) = pl.pallas_call(
        partial(_bwd_kernel_body, num_tiles, tiles_x, max_rows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((GRECT, max_rows * CHUNK), jnp.float32),
        ],
        interpret=interpret,
    )(
        chunk_row_start.astype(jnp.int32), n_chunks.astype(jnp.int32),
        bg.astype(jnp.float32), packed_t, aux_rows,
    )
    return grads_t


def reduce_grads_presort(padgrads, slot_of_inst, rank_rows, offs2, order, n):
    """Per-slot gradient records -> per-ORIGINAL-GAUSSIAN (n, 9) sums,
    via presort-contiguous segments (the tight path's reduction).

    Replaces the direct unsorted segment_sum: XLA lowers that to a
    scatter-add whose random ~36 B writes cost ~16 ns/row (32 ms + 3 ms
    masking at 2.06M slots / 100k Gaussians, scripts/exp_reduce3/4.py).
    Here each split grad buffer is gathered once into PRESORT order
    (where every Gaussian's instances are contiguous), lane-packed
    (m/16, 128) for a full-width cumsum, and segment sums come from
    prefix differences at the N rank boundaries — two small row gathers
    plus elementwise group math. Dead slots carry zero grads (the kernel
    zero-fills them), so no masking pass is needed.

    rank_rows: (rank_row0 (n,), rank_nrows (n,)) — rank j's level-1 rows
    are [rank_row0[j], rank_row0[j] + rank_nrows[j]), free N-scale output
    of the level-1 cumsum; offs2: (R+1,) CSR row pointers
    (offs2[R] = total); order: (n,) depth rank -> original Gaussian
    index.
    """
    m = slot_of_inst.shape[0]
    r_cap = offs2.shape[0] - 1

    # rank ranges are CONSECUTIVE in presort order (rows are emitted
    # rank-major and offs2 is their CSR cumsum), so ends[j] ==
    # starts[j+1]: evaluating the prefix once at the n+1 boundary
    # positions halves the prefix row-gathers vs a starts/ends pair.
    rank_row0, rank_nrows = rank_rows
    bounds_rows = jnp.concatenate(
        [rank_row0, (rank_row0[-1] + rank_nrows[-1])[None]]
    )
    bounds = offs2[jnp.minimum(bounds_rows, r_cap)]  # (n+1,)

    def seg_sum(padgrad):
        grec = padgrad.shape[1]  # 8 (split halves) or 16 (single table)
        gpr = 128 // grec  # grad records per 128-lane packed row
        g = padgrad[slot_of_inst]  # (m, grec) rows, presort order
        # barrier pins the gather output to a real row-major buffer so
        # the lane-pack reshape below is a bitcast, not a layout copy
        # (device-traced 0.7 ms otherwise)
        g = jax.lax.optimization_barrier(g)
        r0 = m // gpr
        rows = g.reshape(r0, 128)
        # two-level cumsum: XLA lowers a flat 64k-row cumsum as log2(n)
        # full-array shifted-add passes (~1.9 ms device at 1M instances);
        # grouping halves the pass count for one extra offset-add pass
        grp_n = 256
        if r0 % grp_n == 0 and r0 > grp_n:
            grp = rows.reshape(r0 // grp_n, grp_n, 128)
            cs_in = jnp.cumsum(grp, axis=1)
            tot = cs_in[:, -1, :]
            off = jnp.cumsum(tot, axis=0) - tot
            cs = (cs_in + off[:, None, :]).reshape(r0, 128)
        else:
            cs = jnp.cumsum(rows, axis=0)

        def prefix_at(pos):  # (k,) -> (k, grec) exclusive prefix of g
            r = pos // gpr
            k = pos % gpr
            nz = (r > 0)[:, None]
            a_prev = jnp.where(
                nz, cs[jnp.maximum(r - 1, 0)], 0.0
            ).reshape(-1, gpr, grec)
            a_cur = cs[jnp.minimum(r, m // gpr - 1)].reshape(-1, gpr, grec)
            full = jnp.sum(a_prev, axis=1)
            within = jnp.where(
                jnp.arange(gpr)[None, :, None] < k[:, None, None],
                a_cur - a_prev, 0.0,
            ).sum(axis=1)
            return full + within

        p = prefix_at(bounds)  # (n+1, GREC)
        return p[1:] - p[:-1]  # (n, GREC), rank order

    if len(padgrads) == 1:
        seg = seg_sum(padgrads[0])  # (n, GRECT), 9 live lanes
    else:
        seg_a = seg_sum(padgrads[0])
        seg_b = seg_sum(padgrads[1])
    # rank -> original order WITHOUT the (n, 9) scatter: out[order[j]] =
    # seg[j] is a 36 B-row random scatter (device-traced 524 ms at 5M
    # Gaussians — the single hottest op of the garden config). Invert
    # the permutation with one 2-array radix sort (order is a full
    # permutation, so sorting it ascending carries rank j to position
    # order[j]) and GATHER: two <=8-lane row gathers ride the fast
    # gather regime instead.
    inv = jax.lax.sort(
        (order, jnp.arange(n, dtype=jnp.int32)), num_keys=1
    )[1]  # inv[g] = depth rank of gaussian g
    if len(padgrads) == 1:
        return seg[inv][:, :9]
    return jnp.concatenate(
        [seg_a[inv][:, :8], seg_b[inv][:, :1]], axis=1
    )


def reduce_grads(padgrads, windows, n):
    """Per-slot gradient records -> per-ORIGINAL-GAUSSIAN (n, 9) sums.

    ONE direct unsorted scatter-add on the kernel's native (slots, GREC)
    layout. Device-measured at 2.6M slots / 100k gaussians
    (scripts/exp_reduce.py): direct segment_sum 45 ms = variadic 10-array
    sort + sorted segment_sum 46 ms; a "2-array sort + wide row gather +
    sorted segment_sum" pipeline is 95 ms — the sorted-order (slots, 16)
    row gather alone costs ~70 ms (fully random 64 B rows). Dead lanes
    carry key >= n and drop. windows holds ORIGINAL gaussian ids (no
    inverse-permutation pass needed).
    """
    if len(padgrads) == 1:
        padgrad = padgrads[0][:, :9]
    else:
        pad_a, pad_b = padgrads
        padgrad = jnp.concatenate([pad_a[:, :8], pad_b[:, :1]], axis=1)
    slots = padgrad.shape[0]
    keys = windows.reshape(slots)
    vals = jnp.where((keys < n)[:, None], padgrad, 0.0)
    return jax.ops.segment_sum(
        vals, jnp.minimum(keys, n - 1), num_segments=n
    )
