"""Production tiled rasterizer — CUDA-pipeline binning, TPU-shaped compute.

Reproduces diff-gaussian-rasterization's binning + per-tile compositing
(SURVEY.md §2.9 steps 2-4; call sites /root/reference/gaussian_renderer/
__init__.py:51-100) with static shapes and, crucially, with NO per-element
scatters or scalar gathers at instance scale — the two op classes the TPU
executes 100-200x slower than everything else (see PERF_NOTES.md):

  1. Gaussians are depth-sorted once at N scale; per-Gaussian rect fields
     (min_x, min_y, rect_w) are packed into int32 words under the depth
     rank's high bits, scattered at each run start, and a `cummax` fills
     the runs — instance i recovers its Gaussian and its rect coordinates
     from pure elementwise arithmetic, replacing round 1's six M-sized
     scalar gathers (~90 ms at 1.24M instances).
  2. ONE stable single-int32-key `lax.sort` (XLA's radix path, ~0.5 ms at
     1.5M keys) groups instances by tile, carrying only the depth rank.
     Per-tile depth order falls out of stability.
  3. Forward/backward compositing runs in the flat Pallas kernels
     (sgs_tpu/ops/pallas/flat_raster.py) over a chunk-padded tile-major
     row layout; per-Gaussian gradients come back through a second cheap
     1-key sort + contiguous segment-sum (flat_raster.reduce_grads).

The "xla" backend keeps the instance-major lax.scan compositor as a
slower self-contained oracle for tests; both backends share the same
binning and the same custom-VJP wrapper.  Backward re-walks back-to-front
like the CUDA backward.cu (differentiating through the forward scan would
store O(P*N) carries — hundreds of GB at 1080p).

Termination semantics are EXACT vs CUDA: along a tile's depth-ordered
list the full running product of (1 - alpha) is monotone non-increasing,
so "include instance i iff the inclusive product stays >= 1e-4"
reproduces the sequential test-before-composite latch.

Instance capacity is a static arg; callers size it from a cheap count
pre-pass (instance_count) rounded up to a bucket so recompiles stay rare.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from sgs_tpu.core.projection import (
    ALPHA_MAX,
    ALPHA_MIN,
    TILE,
    TRANSMITTANCE_EPS,
)

TILE_PIXELS = TILE * TILE


def _tile_rects(mean2d, radius, tiles_x, tiles_y):
    r = radius.astype(jnp.float32)
    min_x = jnp.clip(((mean2d[:, 0] - r) / TILE).astype(jnp.int32), 0, tiles_x)
    max_x = jnp.clip(((mean2d[:, 0] + r + TILE - 1) / TILE).astype(jnp.int32), 0, tiles_x)
    min_y = jnp.clip(((mean2d[:, 1] - r) / TILE).astype(jnp.int32), 0, tiles_y)
    max_y = jnp.clip(((mean2d[:, 1] + r + TILE - 1) / TILE).astype(jnp.int32), 0, tiles_y)
    return min_x, max_x, min_y, max_y


@partial(jax.jit, static_argnames=("width", "height"))
def instance_count(mean2d, radius, valid, width: int, height: int) -> jnp.ndarray:
    """Total duplicated (Gaussian, tile) instances — the capacity pre-pass."""
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    min_x, max_x, min_y, max_y = _tile_rects(mean2d, radius, tiles_x, tiles_y)
    counts = (max_x - min_x) * (max_y - min_y)
    return jnp.sum(jnp.where(valid & (radius > 0), counts, 0))


@partial(jax.jit, static_argnames=("width", "height"))
def row_count(mean2d, radius, valid, width: int, height: int) -> jnp.ndarray:
    """Total (Gaussian, tile-row) level-1 instances for the tight-culling
    expansion — the row-capacity pre-pass."""
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    min_x, max_x, min_y, max_y = _tile_rects(mean2d, radius, tiles_x, tiles_y)
    counts = jnp.where(
        valid & (radius > 0) & (max_x > min_x), max_y - min_y, 0
    )
    return jnp.sum(counts)


def _x_tile_interval(mx, my, ca, cb, cc, tau, ty, min_x, max_x, tiles_x):
    """Exact tile x-interval [txlo, txhi) of the region where a Gaussian
    can contribute a non-zero alpha within tile row `ty`, intersected with
    the reference rect [min_x, max_x).

    A (Gaussian, tile) pair contributes EXACTLY ZERO unless some pixel
    (x, y) of the tile has alpha = op * exp(-P) >= ALPHA_MIN, i.e.
    P(dx, dy) = 0.5(ca dx^2 + cc dy^2) + cb dx dy <= tau = ln(op*255).
    Per tile row (pixel y in [16ty, 16ty+15]) the x-set is the projection
    of a convex region -> an interval, in closed form (validated against
    brute force in scripts/exp_tight.py). Culling with it is BIT-IDENTICAL
    to the reference rect binning — the kernels drop a < ALPHA_MIN — with
    ~35% fewer instances at bench statistics (more for anisotropic
    splats; this is the TPU analogue of gsplat-style tight intersection,
    replacing the CUDA getRect of /root/reference's rasterizer design).

    All elementwise f32; the interval is padded 0.1 px against f32
    rounding (conservative-only errors). Empty -> txlo >= txhi.
    """
    f32 = jnp.float32
    y0 = (16 * ty).astype(f32) - my
    y1 = y0 + 15.0
    cc_s = jnp.maximum(cc, 1e-12)
    det = jnp.maximum(ca * cc - cb * cb, 1e-30)
    x_ext = jnp.sqrt(jnp.maximum(2.0 * tau * cc / det, 0.0))
    slope = cb / cc_s

    def roots_hi(dyb):
        # larger root of 0.5 ca x^2 + cb dyb x + (0.5 cc dyb^2 - tau) = 0
        A = jnp.maximum(ca, 1e-12)
        B = cb * dyb
        C = 0.5 * cc * dyb * dyb - tau
        disc = B * B - 2.0 * A * C
        ok = disc >= 0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        return ok, (-B + sq) / A, (-B - sq) / A

    dy_right = -slope * x_ext
    dyb_r = jnp.clip(dy_right, y0, y1)
    okr, hi_r, _ = roots_hi(dyb_r)
    xhi = jnp.where(dyb_r == dy_right, x_ext, jnp.where(okr, hi_r, -jnp.inf))
    dy_left = slope * x_ext
    dyb_l = jnp.clip(dy_left, y0, y1)
    okl, _, lo_l = roots_hi(dyb_l)
    xlo = jnp.where(dyb_l == dy_left, -x_ext, jnp.where(okl, lo_l, jnp.inf))

    nonempty = (tau > 0.0) & (xhi >= xlo)
    txlo = jnp.maximum(((mx + xlo - 0.1) / TILE).astype(jnp.int32), min_x)
    txhi = jnp.minimum(
        ((mx + xhi + 0.1) / TILE).astype(jnp.int32) + 1, max_x
    )
    txlo = jnp.clip(txlo, 0, tiles_x)
    txhi = jnp.clip(txhi, 0, tiles_x)
    return jnp.where(nonempty, txlo, 0), jnp.where(nonempty, txhi, 0)


# Split the payload/attr tables into two 8-lane halves above this many
# R rows. Round-2's gather model measured a table-byte cliff (22.4
# ns/row from a 126 MB 16-lane table vs 4.9 from each 63 MB half at 1M
# out-rows) and round 3 split on it — but scripts/exp_payload.py
# re-measured at the 5M production shapes (10-15M out-rows) and the
# cliff does NOT reproduce there: one 16-lane gather beats the 8-lane
# pair at BOTH table scales (120.8 vs 142.9 ms R-scale, 175.7 vs 208.3
# slots-scale) because per-dispatch cost dominates. No production shape
# tested benefits from splitting, so the threshold is parked at
# infinity; the branch + its monkeypatched parity test stay as the
# escape hatch if an intermediate regime ever shows the cliff again.
SPLIT_ATTR_TABLE_ROWS = 1 << 62

# Scale-conditional culling-input dispatch (VERDICT r4 weak #1): below
# this many padded rows the level-1 x-interval culling reads an 8-lane
# cull record [mx,my,ca,cb,cc,tau,min_x,max_x] gathered separately at R
# scale with tau/rect bounds precomputed ONCE at N scale — the round-3
# data flow, ~2% faster at 100k-scale buckets than deriving them
# elementwise at R scale from the merged payload. Above it (garden
# regime) the merged payload serves culling too: at 10M+ rows the extra
# 8-lane gather costs more than the R-scale elementwise rederivation
# saves (+66% at 5M, PERF_NOTES). Culling output is bit-identical on
# both sides (same formulas, same inputs).
TWO_GATHER_MAX_ROWS = 768 * 1024

# Attribute-payload table width. 11 lanes carry data (mx,my,ca,cb,cc,
# op,r,g,b,radius,id); 16 was the kernel-operand REC. Narrowing the
# GATHER tables to 12 (16-byte rows) cuts the random bytes of the two
# biggest gather groups (R-scale ranked payload, slots-scale pack) 25%
# — the kernel operand stays (REC, slots) via a zero-row concat AFTER
# the transpose. Parity-exact (pure layout). Default stays 16 until the
# on-device A/B (scripts/exp_prodgap.py) lands a number.
PAYLOAD_LANES = 16

# Fence the slots-scale pack gather from the kernel-operand transpose:
# tests the "folded transpose makes production gathers ~2x their
# isolated cost" hypothesis from the round-4 5M trace (PERF_NOTES "The
# floor, honestly"). Measured on-device before changing the default.
PACK_BARRIER = False

# Reduce per-slot gradients through ONE (slots, GRECT) buffer (one
# gather + one cumsum chain with 9/16 live lanes) instead of two
# (slots, 8) halves (two gathers + two cumsum chains with 9/16 live
# lanes total): exp_payload r4 measured per-dispatch fixed cost
# dominating at 10M rows (G8 beats G44), so fewer dispatches should win
# at garden scale; the round-2 byte-cliff said the opposite at 2M rows.
# Measured on-device at both scales before changing the default.
GRAD_SINGLE_TABLE = False

# ACCURACY PROBE, not a perf path: round the big gather tables (ranked
# attr payload, cull record, per-slot gradient records) through bf16 to
# measure what bf16-narrowed tables WOULD cost in image/grad error
# (VERDICT r5 task 3b: "if parity breaks, record the measured error and
# stop"). Id lanes stay exact (a real bf16 layout would carry ids in a
# separate i32 gather). scripts/exp_bf16_tables.py records the numbers;
# PERF_NOTES holds the verdict. Never enable in production.
PAYLOAD_BF16_SIM = False


def _bf16_round(x, exact_lanes=()):
    """Round an f32 table through bf16, keeping exact_lanes untouched."""
    r = x.astype(jnp.bfloat16).astype(jnp.float32)
    for ln in exact_lanes:
        r = r.at[:, ln].set(x[:, ln])
    return r


def _expand_rows(mean2d, conic, opacity, depth, radius, valid,
                 width, height, max_row_instances, rgb=None):
    """Level-1 tight expansion: Gaussians -> depth-ordered tile-ROW
    instances with exact per-row tile x-intervals.

    Returns (order (N,), grank (R,) gaussian depth rank per row, ty (R,),
    txlo/txhi (R,) exact interval, w (R,) widths, row_live (R,),
    row_overflow, tiles_x, tiles_y, offs, counts_o, (attr_a, attr_b)
    MERGED ranked payload tables). Only elementwise ops, two cummax
    fills, one N-sized sort, and two composed-index row gathers.

    MERGED payload (round 4, from the 5M trace where R-scale payload
    gathers were ~20% of the frame): ONE (R, 8) gather serves BOTH the
    level-1 culling (lanes 0-5: mx, my, ca, cb, cc, op — tau and the
    clipped rect bounds are derived elementwise at R scale) AND, via the
    caller, the slot attribute table (lanes 0-7 are exactly the split-A
    attr record). attr_b carries [b, radius, gaussian-id] — XLA shrinks
    its mostly-dead lanes automatically. With rgb=None (count
    pre-passes) the color lanes are zeros; culling reads only lanes
    0-5, so counts are unchanged."""
    n = mean2d.shape[0]
    i32 = jnp.int32
    f32 = jnp.float32
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    r_cap = max_row_instances

    ok = valid & (radius > 0)
    min_x, max_x, min_y, max_y = _tile_rects(mean2d, radius, tiles_x, tiles_y)
    counts_h = jnp.where(ok & (max_x > min_x), max_y - min_y, 0)

    depth_key = jnp.where(ok, depth.astype(f32), jnp.inf)
    _, order = jax.lax.sort(
        (depth_key, jnp.arange(n, dtype=i32)), num_keys=1, is_stable=True
    )
    counts_o = counts_h[order]
    offs = jnp.cumsum(counts_o) - counts_o
    row_total = offs[-1] + counts_o[-1]
    row_overflow = jnp.maximum(row_total - r_cap, 0)

    fby = int(tiles_y + 1).bit_length()
    assert (n - 1).bit_length() + fby <= 31, "row-fill bit overflow"
    grank_hi = jnp.arange(n, dtype=i32) << fby
    # TWO scatter+cummax fills. Measured alternative (one fill + a
    # monotone offs[grank] gather for the run start) is WORSE: a 426k
    # scalar 1D gather device-traces at ~3 ms vs ~0.9 for the fill —
    # the round-1 "gathers 18x slower" lesson holds even for monotone
    # indices.
    f_y = jax.lax.cummax(
        jnp.zeros((r_cap,), i32).at[offs].max(
            grank_hi | min_y[order], mode="drop"
        )
    )
    run_start = jax.lax.cummax(
        jnp.zeros((r_cap,), i32).at[offs].max(offs.astype(i32), mode="drop")
    )
    ridx = jnp.arange(r_cap, dtype=i32)
    grank = f_y >> fby
    ty = (f_y & ((1 << fby) - 1)) + (ridx - run_start)
    row_live = ridx < jnp.minimum(row_total, r_cap)

    # composed index: ONE int gather shared by both payload gathers
    # (XLA composes attr[order][grank] into a single payload gather with
    # these indices; making the compose explicit lets the A and B
    # payload gathers CSE it)
    gidx = order[grank]  # (R,) original gaussian index per row

    if rgb is None:
        r_col = g_col = b_col = jnp.zeros((n,), f32)
    else:
        r_col = rgb[:, 0].astype(f32)
        g_col = rgb[:, 1].astype(f32)
        b_col = rgb[:, 2].astype(f32)
    assert n < (1 << 24), "f32 id lane exact only below 2^24 gaussians"
    cols = [
        mean2d[:, 0].astype(f32), mean2d[:, 1].astype(f32),
        conic[:, 0].astype(f32), conic[:, 1].astype(f32),
        conic[:, 2].astype(f32), opacity.astype(f32),
        r_col, g_col, b_col, radius.astype(f32),
        jnp.arange(n, dtype=f32),
    ]
    if r_cap + 1 <= SPLIT_ATTR_TABLE_ROWS:
        # below the gather byte-cliff ONE wide table wins: a single
        # (N, 16) source + one R-scale gather + (downstream) one
        # slots-scale gather — two dispatches cost more than the table
        # discount at this size (exp_gather_model; restored round 4
        # after the always-split merged payload regressed the 100k
        # bench 13.1 -> 10.6 fps)
        lanes = max(PAYLOAD_LANES, len(cols))
        attr_n = jnp.stack(
            cols + [jnp.zeros((n,), f32)] * (lanes - len(cols)), axis=1
        )
        if PAYLOAD_BF16_SIM:
            attr_n = _bf16_round(attr_n, exact_lanes=(10,))
        pl = attr_n[gidx]  # (R, 16) — THE merged payload gather
        payload = (pl,)
        mx_r, my_r = pl[:, 0], pl[:, 1]
        c_a, c_b, c_c = pl[:, 2], pl[:, 3], pl[:, 4]
        op_r, rad_r = pl[:, 5], pl[:, 9]
    else:
        attr_a_n = jnp.stack(cols[:8], axis=1)
        attr_b_n = jnp.stack(
            cols[8:] + [jnp.zeros((n,), f32)] * (8 - len(cols[8:])),
            axis=1,
        )
        if PAYLOAD_BF16_SIM:
            attr_a_n = _bf16_round(attr_a_n)
            attr_b_n = _bf16_round(attr_b_n, exact_lanes=(2,))  # id
        attr_a = attr_a_n[gidx]  # (R, 8) — split merged payload gathers
        attr_b = attr_b_n[gidx]
        payload = (attr_a, attr_b)
        mx_r, my_r = attr_a[:, 0], attr_a[:, 1]
        c_a, c_b, c_c = attr_a[:, 2], attr_a[:, 3], attr_a[:, 4]
        op_r, rad_r = attr_a[:, 5], attr_b[:, 1]

    if r_cap <= TWO_GATHER_MAX_ROWS:
        # two-gather dispatch (see TWO_GATHER_MAX_ROWS): tau and the
        # clipped rect x-bounds precompute at N scale; the culling reads
        # its own (N, 8) record through the shared composed index. The
        # payload gather above still feeds the slot attr tables (count
        # pre-passes never consume it there, so XLA drops it for them).
        tau_n = jnp.log(
            jnp.maximum(opacity.astype(f32), 1e-12) * (1.0 / ALPHA_MIN)
        )
        cull_n = jnp.stack(
            [
                mean2d[:, 0].astype(f32), mean2d[:, 1].astype(f32),
                conic[:, 0].astype(f32), conic[:, 1].astype(f32),
                conic[:, 2].astype(f32), tau_n,
                min_x.astype(f32), max_x.astype(f32),
            ],
            axis=1,
        )
        if PAYLOAD_BF16_SIM:
            cull_n = _bf16_round(cull_n, exact_lanes=(6, 7))
        cr = cull_n[gidx]  # (R, 8)
        txlo, txhi = _x_tile_interval(
            cr[:, 0], cr[:, 1], cr[:, 2], cr[:, 3], cr[:, 4], cr[:, 5],
            ty, cr[:, 6].astype(i32), cr[:, 7].astype(i32), tiles_x,
        )
    else:
        # level-1 culling from the merged payload: tau and the clipped
        # rect x-bounds re-derive elementwise at R scale (bit-identical
        # to the N-scale pre-computation: same formulas, same inputs)
        tau_r = jnp.log(jnp.maximum(op_r, 1e-12) * (1.0 / ALPHA_MIN))
        minx_r = jnp.clip(
            ((mx_r - rad_r) / TILE).astype(i32), 0, tiles_x
        )
        maxx_r = jnp.clip(
            ((mx_r + rad_r + TILE - 1) / TILE).astype(i32), 0, tiles_x
        )
        txlo, txhi = _x_tile_interval(
            mx_r, my_r, c_a, c_b, c_c, tau_r,
            ty, minx_r, maxx_r, tiles_x,
        )
    w = jnp.where(row_live, jnp.maximum(txhi - txlo, 0), 0)
    return (
        order, grank, ty, txlo, w, row_live, row_overflow, tiles_x, tiles_y,
        offs, counts_o, payload,
    )


@partial(jax.jit, static_argnames=("width", "height", "max_row_instances"))
def instance_count_tight(
    mean2d, conic, opacity, depth, radius, valid,
    width: int, height: int, max_row_instances: int,
) -> jnp.ndarray:
    """Exact-culled instance total — the tight capacity pre-pass.
    (Counts only rows that fit max_row_instances; size that bucket from
    row_count first.)"""
    out = _expand_rows(
        mean2d, conic, opacity, depth, radius, valid,
        width, height, max_row_instances, rgb=None,
    )
    return jnp.sum(out[4])


@partial(
    jax.jit,
    static_argnames=("width", "height", "max_instances", "max_row_instances"),
)
def kernel_row_count(
    mean2d, conic, opacity, depth, radius, valid,
    width: int, height: int, max_instances: int, max_row_instances: int,
) -> jnp.ndarray:
    """Padded chunk-row count the flat Pallas kernels need for this view
    — the kernel-row bucket pre-pass (sum over tiles of
    ceil(count_t / CHUNK)). The analytic worst case (flat_raster.num_rows)
    is typically ~2x this; sizing the bucket from it halves the pack
    gather, both kernels' DMA streams, and the gradient buffers."""
    from sgs_tpu.ops.pallas import flat_raster as fr

    if max_row_instances > 0:
        tile_s = jax.lax.sort(
            _expand_instances_tight(
                mean2d, conic, opacity, depth, radius, valid,
                width, height, max_instances, max_row_instances,
            )[0]
        )
    else:
        tile_s = _build_instances(
            mean2d, depth, radius, valid, width, height, max_instances
        )[0]
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    start, end = fr.tile_ranges(tile_s, tiles_x * tiles_y)
    return jnp.sum(-(-(end - start) // fr.CHUNK))


def _expand_instances_tight(
    mean2d, conic, opacity, depth, radius, valid,
    width, height, max_instances, max_row_instances, rgb=None,
):
    """Tight binning: two-level expansion (Gaussians -> tile rows ->
    exactly-overlapped tiles) emitting UNSORTED per-instance ids with
    only the instances that can contribute a non-zero alpha (see
    _x_tile_interval).

    Returns (tile_id (M,) instance tile ids, rowid (M,) level-1 ROW ids
    (r_cap = dead sentinel), grank (R,) row -> depth rank, offs2_ptr
    (R+1,) CSR row pointers, rank_rows, order (N,), overflow, num_tiles,
    tiles_x, tiles_y). Instances are emitted depth-rank-major, so any
    STABLE tile-keyed sort downstream preserves per-tile depth order —
    the aligned packer (flat_raster.pack_aligned) relies on exactly
    this."""
    i32 = jnp.int32
    m = max_instances
    (order, grank, ty, txlo, w, row_live, row_overflow, tiles_x, tiles_y,
     rank_row0, rank_nrows, payload) = (
        _expand_rows(
            mean2d, conic, opacity, depth, radius, valid,
            width, height, max_row_instances, rgb=rgb,
        )
    )
    num_tiles = tiles_x * tiles_y
    r_cap = max_row_instances

    offs2 = jnp.cumsum(w) - w
    total = offs2[-1] + w[-1]
    overflow = jnp.maximum(total - m, 0) + row_overflow

    # TWO scatter+cummax fills when the bit budget allows (rid packs with
    # the run's STARTING TILE ID in 32 bits), else THREE (run-start
    # scatters are latency-bound, ~3.7 ms each at 1M instances). The
    # other measured alternative — one rid
    # fill + monotone offs2[rid]/base[rid] gathers — is ~2.5x worse
    # (M-scale scalar 1D gathers device-trace at ~9-23 ms; the round-1
    # gather lesson holds even for monotone indices).
    run2 = jax.lax.cummax(
        jnp.zeros((m,), i32).at[offs2].max(offs2.astype(i32), mode="drop")
    )
    inst = jnp.arange(m, dtype=i32)
    rank2 = inst - run2
    tb = int(num_tiles).bit_length()
    if (r_cap - 1).bit_length() + tb <= 32:
        # merged uint32 fill: rid in the high bits (the max over rows
        # colliding at one offset — all w == 0 except possibly the last —
        # must pick the LARGEST row index, which owns the run), starting
        # tile id ty*tiles_x + txlo in the low bits
        u32 = jnp.uint32
        start_tile = (ty * tiles_x + txlo).astype(u32)
        vals = (jnp.arange(r_cap, dtype=u32) << tb) | start_tile
        f_g = jax.lax.cummax(
            jnp.zeros((m,), u32).at[offs2].max(vals, mode="drop")
        )
        rid = (f_g >> tb).astype(i32)
        base_tile = (f_g & ((1 << tb) - 1)).astype(i32)
    else:
        fb = int(max(tiles_x, tiles_y)).bit_length()
        rid_hi = jnp.arange(r_cap, dtype=i32) << fb
        mask = (1 << fb) - 1
        assert (r_cap - 1).bit_length() + fb <= 31, "level-2 fill bit overflow"

        def fill(vals):
            marks = jnp.zeros((m,), i32).at[offs2].max(
                rid_hi | vals.astype(i32), mode="drop"
            )
            return jax.lax.cummax(marks)

        f_x = fill(txlo)
        f_ty = fill(ty)
        rid = f_x >> fb
        base_tile = (f_ty & mask) * tiles_x + (f_x & mask)
    live = inst < jnp.minimum(total, m)
    tile_id = jnp.where(live, base_tile + rank2, num_tiles).astype(i32)
    # dead instances carry the row sentinel so downstream attribute
    # lookups hit the zero (opacity-0) sentinel record
    rowid = jnp.where(live, rid, r_cap)
    # CSR-style row pointers: offs2_ptr[j] = first instance of row j,
    # offs2_ptr[r_cap] = total; rank n's rows are
    # [rank_row0[n], rank_row0[n] + rank_nrows[n]) (N-scale, free from
    # the level-1 cumsum — NO searchsorted over grank, whose log-step
    # N-from-R gathers device-trace at ~25 ms total)
    offs2_ptr = jnp.concatenate([offs2, (offs2[-1] + w[-1])[None]])
    rank_rows = (rank_row0, rank_nrows)
    return (
        tile_id, rowid, grank, offs2_ptr, rank_rows, order,
        overflow, num_tiles, tiles_x, tiles_y, payload,
    )


def _segmented_cumprod(u: jnp.ndarray, boundary: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumprod along axis 0 of u (G, P), restarting where
    boundary (G,) is True."""

    def combine(a, b):
        fa, va = a
        fb, vb = b
        return fa | fb, jnp.where(fb[:, None], vb, va * vb)

    _, vals = jax.lax.associative_scan(combine, (boundary, u), axis=0)
    return vals


def _segmented_cumsum(x: jnp.ndarray, boundary: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along axis 0 of x (G, ...), restarting at flags."""

    def combine(a, b):
        fa, va = a
        fb, vb = b
        f_shape = (vb.shape[0],) + (1,) * (vb.ndim - 1)
        return fa | fb, jnp.where(fb.reshape(f_shape), vb, va + vb)

    _, vals = jax.lax.associative_scan(combine, (boundary, x), axis=0)
    return vals


def _build_instances(mean2d, depth, radius, valid, width, height, max_instances):
    """Binning: rects -> gather-free instance expansion -> tile-sorted ids.

    Returns (tile_sorted (M,), gi_sorted (M,) depth-rank ids, order (N,)
    depth rank -> original Gaussian index, overflow, num_tiles, tiles_x,
    tiles_y).  The only instance-scale ops are elementwise arithmetic,
    two cummax fills, and one single-key stable int32 sort.
    """
    n = mean2d.shape[0]
    f32 = jnp.float32
    i32 = jnp.int32
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    num_tiles = tiles_x * tiles_y
    m = max_instances

    ok = valid & (radius > 0)
    min_x, max_x, min_y, max_y = _tile_rects(mean2d, radius, tiles_x, tiles_y)
    rect_w = max_x - min_x
    counts = jnp.where(ok, rect_w * (max_y - min_y), 0)

    # Depth-sort GAUSSIANS (N-sized) so instances are emitted in global
    # depth order; the M-sized sort then needs only the tile id as key
    # (stable => per-tile depth order preserved), exactly like a
    # (tile, depth) 2-key stable sort would produce.
    depth_key = jnp.where(ok, depth.astype(f32), jnp.inf)
    _, order = jax.lax.sort(
        (depth_key, jnp.arange(n, dtype=i32)), num_keys=1, is_stable=True
    )
    counts_o = counts[order]
    offsets_o = jnp.cumsum(counts_o) - counts_o  # exclusive
    total = offsets_o[-1] + counts_o[-1]
    overflow = jnp.maximum(total - m, 0)

    # Field packing: each per-Gaussian rect field rides in the low bits of
    # its depth rank.  Scatter at run starts, cummax-fill: the rank is
    # monotone over runs so the max always belongs to the run's owner
    # (zero-count gaussians sharing an offset have strictly smaller
    # ranks).  This replaces per-instance gathers entirely.
    fb = max(tiles_x, tiles_y).bit_length()
    assert (n - 1).bit_length() + fb <= 31, (
        f"bit-packed binning overflow: {n} gaussians x {fb} field bits"
    )
    gi_hi = (jnp.arange(n, dtype=i32) << fb)

    def fill(vals):
        marks = jnp.zeros((m,), i32).at[offsets_o].max(
            gi_hi | vals.astype(i32), mode="drop"
        )
        return jax.lax.cummax(marks)

    f_minxy = fill(min_x[order])  # carries gi + min_x
    f_geom = fill(min_y[order])  # carries gi + min_y
    f_rw = fill(jnp.maximum(rect_w, 1)[order])
    run_start = jax.lax.cummax(
        jnp.zeros((m,), i32).at[offsets_o].max(offsets_o, mode="drop")
    )

    inst = jnp.arange(m, dtype=i32)
    rank = inst - run_start
    mask_f = (1 << fb) - 1
    gi = f_minxy >> fb
    rw = jnp.maximum(f_rw & mask_f, 1)
    tx = (f_minxy & mask_f) + rank % rw
    ty = (f_geom & mask_f) + rank // rw
    live = inst < total
    tile_id = jnp.where(live, ty * tiles_x + tx, num_tiles).astype(i32)

    tile_s, gi_s = jax.lax.sort((tile_id, gi), num_keys=1, is_stable=True)
    return tile_s, gi_s, order, overflow, num_tiles, tiles_x, tiles_y


def _instances_with_gauss_ids(mean2d, depth, radius, valid, width, height, m):
    """Old-style (tile, gaussian-id) instance arrays for the XLA oracle
    backend (the order[gi] conversion is an M-sized scalar gather — fine
    for the test path, excluded from the Pallas production path)."""
    tile_s, gi_s, order, overflow, num_tiles, tiles_x, tiles_y = (
        _build_instances(mean2d, depth, radius, valid, width, height, m)
    )
    g_s = order[gi_s]
    return tile_s, g_s, overflow, num_tiles, tiles_x, tiles_y


def _attr_records(mean2d, conic, rgb, opacity, order, gi_sorted):
    """(M+1, REC) attribute records in TILE-SORTED instance order with a
    zero sentinel row at index M (dead lanes gather it; its opacity 0
    masks them). Column 9 carries the ORIGINAL gaussian id as f32 (exact
    below 2^24) so the backward reduction keys on it without any
    inverse-permutation scatter. Two wide row gathers only — never an
    M-sized scalar gather."""
    from sgs_tpu.ops.pallas import flat_raster as fr

    f32 = jnp.float32
    n = mean2d.shape[0]
    assert n < (1 << 24), "f32 id column exact only below 2^24 gaussians"
    attr = jnp.concatenate(
        [
            mean2d.astype(f32), conic.astype(f32), opacity.astype(f32)[:, None],
            rgb.astype(f32), jnp.arange(n, dtype=f32)[:, None],
            jnp.zeros((n, fr.REC - 10), f32),
        ],
        axis=1,
    )
    attr_ranked = attr[order]  # depth-rank order (N rows)
    attr_sorted = attr_ranked[gi_sorted]  # tile-sorted instances (M rows)
    sentinel = jnp.zeros((1, fr.REC), f32).at[0, 9].set(float(n))
    return jnp.concatenate([attr_sorted, sentinel])


# (The former separate tight-path attr table build — _attr_rows_tight —
# is gone: the level-1 expansion's MERGED ranked payload now feeds both
# the x-interval culling and the slot attribute tables with ONE R-scale
# payload gather pair. See _expand_rows.)

# Above this many padded slots, the tight path's per-Gaussian gradient
# reduction switches from the presort-contiguous pipeline to a direct
# scatter-add keyed on the payload id lane. Round 4 set this to 6M from
# an EXTRAPOLATED 16 ns/row scatter cost — the 5M device re-trace
# measured the scatter-add fusion at 1386 ms/frame (95 ns/slot-row,
# 48% of the frame) vs ~574 ms for the presort pipeline it replaced:
# XLA scatter-add into a 5M-row accumulator does NOT hold its small-
# scale cost. Parked at infinity; the path + its parity test
# (test_tight_scatter_reduction_matches) remain the escape hatch.
REDUCE_SCATTER_SLOTS = 1 << 62


def _chunk_pixels(tids, tiles_x):
    """Pixel coordinates (x, y) of each instance's 256 tile pixels."""
    f32 = jnp.float32
    ly = jax.lax.broadcasted_iota(f32, (TILE, TILE), 0).ravel()
    lx = jax.lax.broadcasted_iota(f32, (TILE, TILE), 1).ravel()
    tyx = (tids // tiles_x).astype(f32) * TILE
    txx = (tids % tiles_x).astype(f32) * TILE
    px = txx[:, None] + lx[None, :]
    py = tyx[:, None] + ly[None, :]
    return px, py


def _alphas(gs, px, py, live, mean2d, conic, opacity):
    """Recompute per-(instance, pixel) alpha with the CUDA cutoffs."""
    dx = mean2d[gs, 0][:, None] - px
    dy = mean2d[gs, 1][:, None] - py
    ca = conic[gs, 0][:, None]
    cb = conic[gs, 1][:, None]
    cc = conic[gs, 2][:, None]
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    q = opacity[gs][:, None] * jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, q)
    a = jnp.where(
        (power <= 0.0) & (alpha >= ALPHA_MIN) & live[:, None], alpha, 0.0
    )
    return a, q, power, dx, dy


# ---------------------------------------------------------------- forward

def _forward_pallas(
    mean2d, depth, conic, rgb, opacity, radius, valid, bg,
    width, height, max_instances, chunk, max_row_instances=0,
    max_kernel_rows=0,
):
    """Flat Pallas forward: gather-free binning, chunk-padded row packing,
    one pipelined kernel sweep. Output contract identical to _forward.
    max_row_instances > 0 selects the TIGHT (exact ellipse/tile) binning
    — bit-identical output, ~35% fewer instances at bench statistics.

    max_kernel_rows > 0 buckets the padded chunk-row count (default is
    the analytic worst case m/CHUNK + num_tiles, typically ~2x the used
    rows): the pack gather, both kernels' DMA streams, and the grad
    buffers all scale with it. Size with kernel_row_count; overflow is
    reported like instance overflow and the caller regrows."""
    from sgs_tpu.ops.pallas import flat_raster as fr

    f32 = jnp.float32
    tight_extras = None
    windows = None
    if max_row_instances > 0:
        (tile_id, rowid, grank, offs2_ptr, rank_rows, order,
         overflow, num_tiles, tiles_x, tiles_y, payload) = (
            _expand_instances_tight(
                mean2d, conic, opacity, depth, radius, valid,
                width, height, max_instances, max_row_instances, rgb=rgb,
            )
        )
        if max_kernel_rows > 0:
            assert max_kernel_rows % fr.KROWS == 0, "kernel-row bucket % KROWS"
            max_rows = max_kernel_rows
        else:
            max_rows = fr.num_rows(max_instances, num_tiles)
        r_cap = grank.shape[0]
        (rowid_padded, inst_padded, row_tile, row_first, row_last, crs,
         nch, rows_used) = fr.pack_aligned(
            tile_id, rowid, num_tiles, max_rows, r_cap
        )
        overflow = overflow + jnp.maximum(rows_used - max_rows, 0) * fr.CHUNK
        # THE pack gather, straight from the level-1 expansion's MERGED
        # payload (the same ranked gather that fed the x-interval
        # culling — no separate attr table build). ONE (R+1, 16) table
        # below the gather byte-cliff; two compact (R+1, 8) halves above
        # it (SPLIT_ATTR_TABLE_ROWS — the split choice is made where the
        # payload is built, in _expand_rows). Sentinel row r_cap:
        # opacity 0, id lane (10) = n.
        n_g = mean2d.shape[0]
        if len(payload) == 1:
            lanes = payload[0].shape[1]
            sent = jnp.zeros((1, lanes), f32).at[0, 10].set(float(n_g))
            tab = jnp.concatenate([payload[0], sent])
            packed = tab[rowid_padded]
        else:
            attr_a_r, attr_b_r = payload
            tab_a = jnp.concatenate([attr_a_r, jnp.zeros((1, 8), f32)])
            tab_b = jnp.concatenate(
                [attr_b_r, jnp.zeros((1, 8), f32).at[0, 2].set(float(n_g))]
            )
            packed = jnp.concatenate(
                [tab_a[rowid_padded], tab_b[rowid_padded]], axis=1
            )
        tight_extras = {
            "inst_padded": inst_padded, "rank_rows": rank_rows,
            "offs2_ptr": offs2_ptr, "order": order,
        }
    else:
        tile_s, gi_s, order, overflow, num_tiles, tiles_x, tiles_y = (
            _build_instances(
                mean2d, depth, radius, valid, width, height, max_instances
            )
        )
        attr_sorted = _attr_records(mean2d, conic, rgb, opacity, order, gi_s)
        if max_kernel_rows > 0:
            assert max_kernel_rows % fr.KROWS == 0, "kernel-row bucket % KROWS"
            max_rows = max_kernel_rows
        else:
            max_rows = fr.num_rows(max_instances, num_tiles)
        (packed, windows, row_tile, row_first, row_last, crs, nch, _ts,
         rows_used) = fr.pack_rows(attr_sorted, tile_s, num_tiles, max_rows)
        overflow = overflow + jnp.maximum(rows_used - max_rows, 0) * fr.CHUNK
    interpret = jax.default_backend() == "cpu"
    # transposed (REC, slots) kernel operand: compact under the Pallas
    # {1,0} layout (a (slots, 16) operand would be lane-padded 8x).
    # PACK_BARRIER pins the pack gather to its own row-major buffer
    # before the transpose; narrow payloads pad back to REC with a
    # zero-row concat AFTER transposing (the gather then moves
    # PAYLOAD_LANES-wide rows, not REC-wide).
    if PACK_BARRIER:
        packed = jax.lax.optimization_barrier(packed)
    packed_t = jnp.transpose(packed)
    if packed_t.shape[0] < fr.REC:
        packed_t = jnp.concatenate(
            [
                packed_t,
                jnp.zeros(
                    (fr.REC - packed_t.shape[0], packed_t.shape[1]), f32
                ),
            ]
        )
    colors, t_final, last_contrib = fr.forward_flat(
        packed_t, crs, nch, num_tiles, tiles_x, interpret=interpret,
    )
    # channel-first tile layout (T, 3, 256) assembles straight into (3, H, W)
    out = colors + t_final[:, None, :] * bg[None, :, None].astype(f32)
    img = out.reshape(tiles_y, tiles_x, 3, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, tiles_y * TILE, tiles_x * TILE)
    img = img[:, :height, :width]
    # row_tile stays XLA-side only (the backward's aux row gather); the
    # kernels derive row ownership from the T-scale crs/nch CSR tables
    # (the (max_rows,) scalar-prefetch maps overflowed SMEM at 5M scale)
    built = {
        "packed_t": packed_t, "windows": windows, "row_tile": row_tile,
        "crs": crs, "nch": nch, "tight": tight_extras,
    }
    return img, overflow, t_final, last_contrib, built


def _forward(
    mean2d, depth, conic, rgb, opacity, radius, valid, bg,
    width, height, max_instances, chunk,
):
    f32 = jnp.float32
    tile_s, g_s, overflow, num_tiles, tiles_x, tiles_y = (
        _instances_with_gauss_ids(
            mean2d, depth, radius, valid, width, height, max_instances
        )
    )
    m = max_instances
    num_chunks = -(-m // chunk)
    pad = num_chunks * chunk - m
    if pad:
        tile_s = jnp.concatenate([tile_s, jnp.full((pad,), num_tiles, tile_s.dtype)])
        g_s = jnp.concatenate([g_s, jnp.zeros((pad,), g_s.dtype)])
    tile_c = tile_s.reshape(num_chunks, chunk)
    g_c = g_s.reshape(num_chunks, chunk)
    pos_c = jnp.arange(num_chunks * chunk, dtype=jnp.int32).reshape(num_chunks, chunk)

    mean2d_f = mean2d.astype(f32)
    conic_f = conic.astype(f32)
    rgb_f = rgb.astype(f32)
    opac_f = opacity.astype(f32)

    def step(carry, xs):
        colors, t_final, last_contrib, open_tile, s_open = carry
        tids, gs, pos = xs
        inst_live = tids < num_tiles
        px, py = _chunk_pixels(tids, tiles_x)
        a, _, _, _, _ = _alphas(gs, px, py, inst_live, mean2d_f, conic_f, opac_f)
        u = 1.0 - a

        prev_tile = jnp.concatenate([open_tile[None], tids[:-1]])
        boundary = tids != prev_tile
        s_seg = _segmented_cumprod(u, boundary)
        seg_id = jnp.cumsum(boundary.astype(jnp.int32))
        continuing = seg_id == 0
        seed = jnp.where(continuing[:, None], s_open[None, :], 1.0)
        s = s_seg * seed

        include = (s >= TRANSMITTANCE_EPS) & (a > 0.0)
        s_prev = jnp.concatenate(
            [jnp.ones((1, TILE_PIXELS), f32), s_seg[:-1]], axis=0
        )
        s_prev = jnp.where(boundary[:, None], 1.0, s_prev) * seed
        w = s_prev * a * include.astype(f32)

        contrib = w[:, :, None] * rgb_f[gs][:, None, :]
        colors = colors.at[tids].add(contrib, mode="drop")
        t_candidate = jnp.where(include | (a == 0.0), jnp.where(include, s, 1.0), 1.0)
        t_candidate = jnp.where(inst_live[:, None], t_candidate, 1.0)
        t_final = t_final.at[tids].min(t_candidate, mode="drop")
        # last contributor position + 1 (0 = none)
        lc = jnp.where(include, (pos + 1)[:, None], 0)
        last_contrib = last_contrib.at[tids].max(lc, mode="drop")

        new_open_tile = jnp.where(inst_live[-1], tids[-1], open_tile)
        new_s_open = jnp.where(inst_live[-1], s[-1], s_open)
        return (colors, t_final, last_contrib, new_open_tile, new_s_open), None

    init = (
        jnp.zeros((num_tiles, TILE_PIXELS, 3), f32),
        jnp.ones((num_tiles, TILE_PIXELS), f32),
        jnp.zeros((num_tiles, TILE_PIXELS), jnp.int32),
        jnp.int32(num_tiles + 1),
        jnp.ones((TILE_PIXELS,), f32),
    )
    (colors, t_final, last_contrib, _, _), _ = jax.lax.scan(
        step, init, (tile_c, g_c, pos_c)
    )

    out = colors + t_final[:, :, None] * bg[None, None, :].astype(f32)
    img = out.reshape(tiles_y, tiles_x, TILE, TILE, 3)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * TILE, tiles_x * TILE, 3)
    img = img[:height, :width].transpose(2, 0, 1)
    return img, overflow, t_final, last_contrib


# ---------------------------------------------------------------- backward

def _image_to_tiles(d_img, width, height, tiles_x, tiles_y):
    """(3, H, W) cotangent -> (T, 256, 3) tile layout (zero-padded crop)."""
    h_pad, w_pad = tiles_y * TILE, tiles_x * TILE
    dC = jnp.zeros((h_pad, w_pad, 3), jnp.float32)
    dC = dC.at[:height, :width].set(d_img.transpose(1, 2, 0).astype(jnp.float32))
    dC = dC.reshape(tiles_y, TILE, tiles_x, TILE, 3).transpose(0, 2, 1, 3, 4)
    return dC.reshape(tiles_x * tiles_y, TILE_PIXELS, 3)


def _image_to_tiles_cf(d_img, width, height, tiles_x, tiles_y):
    """(3, H, W) cotangent -> (T, 3, 256) channel-first tile layout
    (the flat Pallas kernels' native shape: pixels on lanes)."""
    h_pad, w_pad = tiles_y * TILE, tiles_x * TILE
    dC = jnp.zeros((3, h_pad, w_pad), jnp.float32)
    dC = dC.at[:, :height, :width].set(d_img.astype(jnp.float32))
    dC = dC.reshape(3, tiles_y, TILE, tiles_x, TILE).transpose(1, 3, 0, 2, 4)
    return dC.reshape(tiles_x * tiles_y, 3, TILE_PIXELS)


def _backward_pallas_host(
    mean2d, depth, conic, rgb, opacity, radius, valid, bg,
    width, height, max_instances, chunk,
    t_final, last_contrib, d_img, built,
):
    """Flat Pallas backward: reverse pipelined sweep emits per-slot
    gradient records; per-Gaussian reduction is sort + contiguous
    segment-sum (flat_raster.reduce_grads). `built` is the forward's
    packing residual (avoids a rebuild)."""
    from sgs_tpu.ops.pallas import flat_raster as fr

    n = mean2d.shape[0]
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    num_tiles = tiles_x * tiles_y
    packed_t, windows = built["packed_t"], built["windows"]
    row_tile, crs, nch = built["row_tile"], built["crs"], built["nch"]

    dC = _image_to_tiles_cf(d_img, width, height, tiles_x, tiles_y)
    safe_tile = jnp.minimum(row_tile, num_tiles - 1)
    slots = packed_t.shape[1]
    # ONE fused (T, 5, 256) aux table -> one row gather, one kernel
    # operand (separate tfl/dc operands sublane-pad 2->8 and 3->8: 2x
    # the streamed bytes and two gathers)
    aux_tiles = jnp.concatenate(
        [t_final[:, None, :], last_contrib[:, None, :], dC], axis=1
    )
    aux_rows = aux_tiles[safe_tile]
    interpret = jax.default_backend() == "cpu"
    grads_t = fr.backward_flat(
        packed_t, crs, nch, bg, aux_rows, tiles_x,
        num_tiles, interpret=interpret,
    )
    if PAYLOAD_BF16_SIM:
        # probe the reduction-table half of the bf16 question: per-slot
        # gradient records rounded before the gather/cumsum reduction
        grads_t = grads_t.astype(jnp.bfloat16).astype(jnp.float32)
    # reduction gather buffers; compact-to-compact XLA transposes.
    # optimization_barrier pins the transposes to a real row-major
    # materialization: without it XLA may assign the {0,1}
    # (column-major) layout and the reduction's row gathers then read
    # scattered words per row (device-traced 3x slower).
    if GRAD_SINGLE_TABLE:
        # ONE (slots, 16) buffer: one gather + one cumsum chain with
        # 9/16 live lanes (see flag comment)
        padgrads = (
            jax.lax.optimization_barrier(jnp.transpose(grads_t)),
        )
    else:
        # split (slots, 8) halves for the <=8-lane-row gather regime
        padgrads = jax.lax.optimization_barrier(
            (
                jnp.transpose(grads_t[0:8]),  # mx,my,ca,cb,cc,op,r,g
                jnp.transpose(grads_t[8:16]),  # b, zeros
            )
        )
    tight = built.get("tight")
    if tight is not None and slots > REDUCE_SCATTER_SLOTS:
        # garden-scale regime: the presort reduction's two (slots, 8)
        # random row gathers + permutation sort grow past the direct
        # scatter-add's cost (5M trace: the reduction gathers alone were
        # ~17% of the frame). Keys come FREE from the merged payload's
        # id lane (packed_t row 10); dead/padding slots carry id = n and
        # zero grads, so they drop exactly like rect-path windows.
        keys = packed_t[10].astype(jnp.int32)
        d = fr.reduce_grads(padgrads, keys, n)
    elif tight is not None:
        # presort-contiguous reduction (no scatter-add; see
        # flat_raster.reduce_grads_presort). slot_of_inst is derived
        # HERE (backward-only cost) from the aligned layout's
        # slot -> instance map.
        slot_of_inst = fr.slot_of_inst_from_padded(
            tight["inst_padded"], max_instances
        )
        d = fr.reduce_grads_presort(
            padgrads, slot_of_inst, tight["rank_rows"],
            tight["offs2_ptr"], tight["order"], n,
        )
    else:
        # windows key on ORIGINAL gaussian ids, so this is already in
        # original order — no inverse-permutation scatter
        d = fr.reduce_grads(padgrads, windows, n)  # (n, 9)
    # layout: [g_mx, g_my, g_ca, g_cb, g_cc, g_op, g_r, g_g, g_b]
    return d[:, 0:2], d[:, 2:5], d[:, 6:9], d[:, 5]


def _backward(
    mean2d, depth, conic, rgb, opacity, radius, valid, bg,
    width, height, max_instances, chunk,
    t_final, last_contrib, d_img,
):
    """Back-to-front re-walk, mirroring backward.cu's per-tile loop."""
    f32 = jnp.float32
    tile_s, g_s, _, num_tiles, tiles_x, tiles_y = _instances_with_gauss_ids(
        mean2d, depth, radius, valid, width, height, max_instances
    )
    n = mean2d.shape[0]
    m = max_instances
    num_chunks = -(-m // chunk)
    pad = num_chunks * chunk - m
    if pad:
        tile_s = jnp.concatenate([tile_s, jnp.full((pad,), num_tiles, tile_s.dtype)])
        g_s = jnp.concatenate([g_s, jnp.zeros((pad,), g_s.dtype)])
    mp = num_chunks * chunk

    # cotangent image -> (T, 256, 3) tile layout (zero-pad the crop)
    dC = _image_to_tiles(d_img, width, height, tiles_x, tiles_y)

    # reverse instance order
    tile_r = jnp.flip(tile_s)
    g_r = jnp.flip(g_s)
    pos_r = jnp.flip(jnp.arange(mp, dtype=jnp.int32))
    tile_c = tile_r.reshape(num_chunks, chunk)
    g_c = g_r.reshape(num_chunks, chunk)
    pos_c = pos_r.reshape(num_chunks, chunk)

    mean2d_f = mean2d.astype(f32)
    conic_f = conic.astype(f32)
    rgb_f = rgb.astype(f32)
    opac_f = opacity.astype(f32)
    bg_f = bg.astype(f32)

    def step(carry, xs):
        d_mean2d, d_conic, d_rgb, d_opac, open_tile, r_open, s_open = carry
        tids, gs, pos = xs
        inst_live = tids < num_tiles
        px, py = _chunk_pixels(tids, tiles_x)
        a, q, _, dx, dy = _alphas(gs, px, py, inst_live, mean2d_f, conic_f, opac_f)

        # contributor mask from the stored last-contributor position
        lc = last_contrib[jnp.clip(tids, 0, num_tiles - 1)]  # (G, 256)
        contrib = (pos[:, None] < lc) & (a > 0.0) & inst_live[:, None]
        u = jnp.where(contrib, 1.0 - a, 1.0)
        a_c = jnp.where(contrib, a, 0.0)

        prev_tile = jnp.concatenate([open_tile[None], tids[:-1]])
        boundary = tids != prev_tile
        seg_id = jnp.cumsum(boundary.astype(jnp.int32))
        continuing = (seg_id == 0)[:, None]

        tf = t_final[jnp.clip(tids, 0, num_tiles - 1)]  # (G, 256)
        dc_t = dC[jnp.clip(tids, 0, num_tiles - 1)]  # (G, 256, 3)

        # r_i = prod of u_j for (forward) j >= i within the tile, incl. i
        r_seg = _segmented_cumprod(u, boundary)
        r_seed = jnp.where(continuing, r_open[None, :], 1.0)
        r = r_seg * r_seed
        t_before = tf / r  # T_i (transmittance before compositing i)

        # suffix color sum S_i = sum_{forward j > i} w_j c_j + T_fin * bg
        w = t_before * a_c
        wc = w[:, :, None] * rgb_f[gs][:, None, :]
        wc_prev = jnp.concatenate(
            [jnp.zeros((1, TILE_PIXELS, 3), f32), wc[:-1]], axis=0
        )
        wc_prev = jnp.where(boundary[:, None, None], 0.0, wc_prev)
        s_excl = _segmented_cumsum(wc_prev, boundary)
        s_seed = jnp.where(
            continuing[:, :, None],
            s_open[None, :, :],
            (tf[:, :, None] * bg_f[None, None, :]),
        )
        suffix = s_excl + s_seed  # (G, 256, 3): sum over j>i + bg term

        # dL/da_i = dC . (T_i c_i - suffix_i / u_i)
        dot_c = jnp.einsum("gpc,gc->gp", dc_t, rgb_f[gs], precision=jax.lax.Precision.HIGHEST)
        dot_suffix = jnp.sum(dc_t * suffix, axis=-1)
        g_alpha = jnp.where(
            contrib, t_before * dot_c - dot_suffix / u, 0.0
        )

        # chain through a = min(0.99, q), q = op * exp(power)
        not_clamped = q < ALPHA_MAX
        g_q = jnp.where(not_clamped, g_alpha, 0.0)
        g_power = q * g_q  # dq/dpower = q
        g_op_pix = jnp.where(contrib & not_clamped, q / jnp.maximum(opac_f[gs][:, None], 1e-12), 0.0) * g_alpha

        # power partials
        ca = conic_f[gs, 0][:, None]
        cb = conic_f[gs, 1][:, None]
        cc = conic_f[gs, 2][:, None]
        g_ca = jnp.sum(-0.5 * dx * dx * g_power, axis=1)
        g_cb = jnp.sum(-dx * dy * g_power, axis=1)
        g_cc = jnp.sum(-0.5 * dy * dy * g_power, axis=1)
        g_dx = (-(ca * dx + cb * dy)) * g_power
        g_dy = (-(cc * dy + cb * dx)) * g_power
        g_mx = jnp.sum(g_dx, axis=1)  # d(dx)/d(mean_x) = 1
        g_my = jnp.sum(g_dy, axis=1)
        g_rgb = jnp.einsum("gp,gpc->gc", w, dc_t, precision=jax.lax.Precision.HIGHEST)
        g_opacity = jnp.sum(g_op_pix, axis=1)

        d_mean2d = d_mean2d.at[gs, 0].add(g_mx, mode="drop")
        d_mean2d = d_mean2d.at[gs, 1].add(g_my, mode="drop")
        d_conic = d_conic.at[gs, 0].add(g_ca, mode="drop")
        d_conic = d_conic.at[gs, 1].add(g_cb, mode="drop")
        d_conic = d_conic.at[gs, 2].add(g_cc, mode="drop")
        d_rgb = d_rgb.at[gs].add(g_rgb, mode="drop")
        d_opac = d_opac.at[gs].add(g_opacity, mode="drop")

        new_open_tile = jnp.where(inst_live[-1], tids[-1], open_tile)
        new_r_open = jnp.where(inst_live[-1], r[-1], r_open)
        new_s_open = jnp.where(
            inst_live[-1], suffix[-1] + wc[-1], s_open
        )
        return (
            d_mean2d, d_conic, d_rgb, d_opac,
            new_open_tile, new_r_open, new_s_open,
        ), None

    init = (
        jnp.zeros((n, 2), f32),
        jnp.zeros((n, 3), f32),
        jnp.zeros((n, 3), f32),
        jnp.zeros((n,), f32),
        jnp.int32(num_tiles + 1),
        jnp.ones((TILE_PIXELS,), f32),
        jnp.zeros((TILE_PIXELS, 3), f32),
    )
    (d_mean2d, d_conic, d_rgb, d_opac, _, _, _), _ = jax.lax.scan(
        step, init, (tile_c, g_c, pos_c)
    )
    return d_mean2d, d_conic, d_rgb, d_opac


# ---------------------------------------------------------------- public

@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def _rasterize_core(
    mean2d, depth, conic, rgb, opacity, radius, valid, bg,
    width, height, max_instances, chunk, backend, max_row_instances,
    max_kernel_rows,
):
    if backend == "pallas":
        img, overflow = _forward_pallas(
            mean2d, depth, conic, rgb, opacity, radius, valid, bg,
            width, height, max_instances, chunk, max_row_instances,
            max_kernel_rows,
        )[:2]
    else:
        img, overflow, _, _ = _forward(
            mean2d, depth, conic, rgb, opacity, radius, valid, bg,
            width, height, max_instances, chunk,
        )
    return img, overflow


def _core_fwd(
    mean2d, depth, conic, rgb, opacity, radius, valid, bg,
    width, height, max_instances, chunk, backend, max_row_instances,
    max_kernel_rows,
):
    if backend == "pallas":
        img, overflow, t_final, last_contrib, built = _forward_pallas(
            mean2d, depth, conic, rgb, opacity, radius, valid, bg,
            width, height, max_instances, chunk, max_row_instances,
            max_kernel_rows,
        )
    else:
        img, overflow, t_final, last_contrib = _forward(
            mean2d, depth, conic, rgb, opacity, radius, valid, bg,
            width, height, max_instances, chunk,
        )
        built = None
    res = (
        mean2d, depth, conic, rgb, opacity, radius, valid, bg,
        t_final, last_contrib, built,
    )
    return (img, overflow), res


def _core_bwd(
    width, height, max_instances, chunk, backend, max_row_instances,
    max_kernel_rows, res, cotangents,
):
    (
        mean2d, depth, conic, rgb, opacity, radius, valid, bg,
        t_final, last_contrib, built,
    ) = res
    d_img, _d_overflow = cotangents
    if backend == "pallas":
        d_mean2d, d_conic, d_rgb, d_opac = _backward_pallas_host(
            mean2d, depth, conic, rgb, opacity, radius, valid, bg,
            width, height, max_instances, chunk,
            t_final, last_contrib, d_img, built,
        )
    else:
        d_mean2d, d_conic, d_rgb, d_opac = _backward(
            mean2d, depth, conic, rgb, opacity, radius, valid, bg,
            width, height, max_instances, chunk,
            t_final, last_contrib, d_img,
        )
    # bg gradient: sum over pixels of T_final * dC (flows into training loss
    # only when bg is a traced input; reference treats bg as constant)
    tiles_x = -(-width // TILE)
    tiles_y = -(-height // TILE)
    dC = _image_to_tiles(d_img, width, height, tiles_x, tiles_y)
    d_bg = jnp.sum(t_final[:, :, None] * dC, axis=(0, 1)).astype(bg.dtype)

    zero_i32 = jnp.zeros(radius.shape, jax.dtypes.float0)
    zero_bool = jnp.zeros(valid.shape, jax.dtypes.float0)
    return (
        d_mean2d.astype(mean2d.dtype),
        jnp.zeros_like(depth),
        d_conic.astype(conic.dtype),
        d_rgb.astype(rgb.dtype),
        d_opac.astype(opacity.dtype),
        zero_i32,
        zero_bool,
        d_bg,
    )


_rasterize_core.defvjp(_core_fwd, _core_bwd)


@partial(jax.jit, static_argnames=("width", "height"))
def visible_count(mean2d, radius, valid, width: int, height: int):
    """Visible-gaussian total — the max_visible bucket pre-pass (the
    same validity test the binning applies: alive/valid AND on-screen
    radius)."""
    del mean2d, width, height
    return jnp.sum((valid & (radius > 0)).astype(jnp.int32))


def _visible_compact(mean2d, depth, conic, rgb, opacity, radius, valid,
                     max_visible: int):
    """Compact the per-Gaussian render inputs to the visible subset
    (round 4, the 5M-regime structural cut): every N-scale pass of the
    binning (depth sort, payload stacks, level-1 fills) otherwise costs
    full pool CAPACITY per frame, while real captures keep only ~40-60%
    of a converged pool in any one frustum (and training pools carry a
    dead tail of up to 2x). One cumsum + row scatters — differentiable
    (the scatter's transpose gathers cotangents back to original
    indices), exact (dead slots carry valid=False), overflow-reported
    like every other static bucket."""
    i32 = jnp.int32
    n = valid.shape[0]
    flag = valid & (radius > 0)
    # Sort-based compaction, NOT scatter-based: a stable 1-key sort on
    # ~flag carries the source index (visible rows first, original
    # order preserved), then everything moves by ROW GATHERS from the
    # dense N-scale sources. The first formulation scattered each input
    # into the compact buffer — six XLA scatters which the 5M re-trace
    # prices at ~95 ns/row (the REDUCE_SCATTER lesson): ~2 s/frame.
    # The sort is ~3 ns/key and the gathers ~7 ns/row at 5M shapes
    # (scripts/exp_payload.py).
    _, src = jax.lax.sort(
        ((~flag).astype(i32), jnp.arange(n, dtype=i32)),
        num_keys=1, is_stable=True,
    )
    src_c = src[:max_visible] if max_visible <= n else jnp.concatenate(
        [src, jnp.zeros((max_visible - n,), i32)]
    )
    nvis = jnp.sum(flag.astype(i32))
    valid_c = jnp.arange(max_visible, dtype=i32) < jnp.minimum(nvis, n)
    ovf = jnp.maximum(nvis - max_visible, 0)
    # ONE 11-lane row gather, not six per-array gathers: the 1-lane
    # arrays (depth/opacity/radius) would lower as SCALAR gathers
    # (~18x slower, the round-1 lesson) — measured +600 ms/frame at 5M
    # before this stacking.
    f32 = jnp.float32
    rec = jnp.concatenate(
        [
            mean2d.astype(f32), depth.astype(f32)[:, None],
            conic.astype(f32), rgb.astype(f32),
            opacity.astype(f32)[:, None],
            radius.astype(f32)[:, None],
        ],
        axis=1,
    )
    rc = rec[src_c]
    return (
        rc[:, 0:2], rc[:, 2], rc[:, 3:6], rc[:, 6:9], rc[:, 9],
        rc[:, 10].astype(radius.dtype), valid_c, ovf,
    )


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "max_instances", "chunk", "backend",
        "max_row_instances", "max_kernel_rows", "max_visible",
    ),
)
def rasterize_tiled(
    mean2d: jnp.ndarray,  # (N, 2)
    depth: jnp.ndarray,  # (N,)
    conic: jnp.ndarray,  # (N, 3)
    rgb: jnp.ndarray,  # (N, 3)
    opacity: jnp.ndarray,  # (N,)
    radius: jnp.ndarray,  # (N,) int32 (0 = culled)
    valid: jnp.ndarray,  # (N,) bool
    bg: jnp.ndarray,  # (3,)
    width: int,
    height: int,
    max_instances: int,
    chunk: int = 1024,
    backend: str = "xla",  # "xla" | "pallas" (forward kernel choice)
    max_row_instances: int = 0,  # > 0: tight (exact ellipse/tile) binning
    max_kernel_rows: int = 0,  # > 0: padded chunk-row bucket (pallas)
    max_visible: int = 0,  # > 0: frustum/alive compaction bucket
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ((3, H, W) image, overflow count). overflow counts
    instances dropped by the static capacities (tight mode adds dropped
    tile-ROW slots, the kernel-row bucket adds dropped padded slots,
    and max_visible adds dropped visible Gaussians); 0 = exact render.

    max_visible > 0 compacts the inputs to the visible subset first
    (size with visible_count): every N-scale binning pass then costs
    the visible count, not the pool capacity — the structural cut for
    garden-scale pools where any one frustum sees a fraction of N."""
    mean2d = mean2d.astype(jnp.float32)
    depth = depth.astype(jnp.float32)
    conic = conic.astype(jnp.float32)
    rgb = rgb.astype(jnp.float32)
    opacity = opacity.astype(jnp.float32)
    bg = bg.astype(jnp.float32)
    vis_ovf = jnp.zeros((), jnp.int32)
    if max_visible > 0:
        (mean2d, depth, conic, rgb, opacity, radius, valid, vis_ovf) = (
            _visible_compact(
                mean2d, depth, conic, rgb, opacity, radius, valid,
                max_visible,
            )
        )
    img, overflow = _rasterize_core(
        mean2d,
        depth,
        conic,
        rgb,
        opacity,
        radius,
        valid,
        bg,
        width,
        height,
        max_instances,
        chunk,
        backend,
        max_row_instances,
        max_kernel_rows,
    )
    return img, overflow + vis_ovf

@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "slabs", "max_instances", "chunk", "backend",
        "max_row_instances", "max_kernel_rows",
    ),
)
def rasterize_slabbed(
    mean2d: jnp.ndarray,
    depth: jnp.ndarray,
    conic: jnp.ndarray,
    rgb: jnp.ndarray,
    opacity: jnp.ndarray,
    radius: jnp.ndarray,
    valid: jnp.ndarray,
    bg: jnp.ndarray,
    width: int,
    height: int,
    slabs: int,
    max_instances: int,
    chunk: int = 1024,
    backend: str = "pallas",
    max_row_instances: int = 0,
    max_kernel_rows: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab rendering: the frame is split into `slabs` horizontal slabs
    rendered SEQUENTIALLY in one jit, concatenated to the full image.

    The garden-scale (5M-Gaussian) regime's per-instance cost grows
    2.7x over the 100k regime because the instance-scale tables (sorted
    arrays, attr tables, grad buffers) leave their fast gather/sort
    regimes (PERF_NOTES scaling table). Per-slab tables are ~1/slabs
    the size, so every instance-scale op runs in the fast regime; the
    N-scale projection inputs are shared, and XLA CSE merges the
    slab-invariant depth sort across the unrolled slab calls.

    Buckets (max_instances / max_row_instances / max_kernel_rows) are
    PER-SLAB: size them from a max over the slab viewports (see
    scripts/exp_slab.py). Returns ((3, H, W) image, summed overflow).
    """
    tiles_y = -(-height // TILE)
    slab_ty = -(-tiles_y // slabs)
    bh = slab_ty * TILE
    shift = jnp.asarray([0.0, 1.0], jnp.float32)
    imgs = []
    overflow = jnp.int32(0)
    for s in range(slabs):
        img_s, ovf_s = rasterize_tiled(
            mean2d - shift * float(s * bh), depth, conic, rgb, opacity,
            radius, valid, bg, width, bh,
            max_instances=max_instances, chunk=chunk, backend=backend,
            max_row_instances=max_row_instances,
            max_kernel_rows=max_kernel_rows,
        )
        imgs.append(img_s)
        overflow = overflow + ovf_s
    full = jnp.concatenate(imgs, axis=1)[:, :height, :]
    return full, overflow
