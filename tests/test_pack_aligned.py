"""Unit tests for the sort-aligned tile packer (flat_raster.pack_aligned)
and its slot->instance inversion — the round-3 replacement of the
slots-scale pack gather (reference counterpart: the CUB binning stage of
diff-gaussian-rasterization, SURVEY §2.9 step 2).

The render parity suite exercises these end-to-end; here the layout
invariants are checked directly against a numpy oracle on adversarial
tile distributions (empty tiles, exact chunk-boundary counts, all-one-
tile, dead instances, bucket truncation).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sgs_tpu.ops.pallas import flat_raster as fr


def _oracle_layout(tile_id, num_tiles):
    """Per-tile instance lists in emission (depth) order."""
    lists = [[] for _ in range(num_tiles)]
    for i, t in enumerate(tile_id):
        if t < num_tiles:
            lists[t].append(i)
    return lists


def _check(tile_id, num_tiles, max_rows=None):
    m = len(tile_id)
    tile_id = np.asarray(tile_id, np.int32)
    lists = _oracle_layout(tile_id, num_tiles)
    counts = np.array([len(l) for l in lists])
    n_chunks_o = -(-counts // fr.CHUNK)
    rows_needed = int(n_chunks_o.sum())
    if max_rows is None:
        max_rows = -(-max(rows_needed, 1) // fr.KROWS) * fr.KROWS
    r_sentinel = m + 7  # arbitrary sentinel row index

    rowid = np.where(tile_id < num_tiles, np.arange(m), r_sentinel).astype(
        np.int32
    )
    (rowid_p, inst_p, row_tile, row_first, row_last, crs, nch, rows_used) = [
        np.asarray(x)
        for x in fr.pack_aligned(
            jnp.asarray(tile_id), jnp.asarray(rowid), num_tiles, max_rows,
            r_sentinel,
        )
    ]

    assert rows_used == rows_needed
    np.testing.assert_array_equal(nch, n_chunks_o)
    np.testing.assert_array_equal(crs, np.cumsum(n_chunks_o) - n_chunks_o)

    if rows_needed > max_rows:
        return  # truncated: frame is overflow-flagged; layout undefined past cap

    # every tile block lands chunk-aligned at crs[t]*CHUNK, in depth order,
    # padded with the sentinel row / dead instance id
    for t in range(num_tiles):
        base = crs[t] * fr.CHUNK
        blk = inst_p[base : base + n_chunks_o[t] * fr.CHUNK]
        np.testing.assert_array_equal(blk[: counts[t]], lists[t])
        assert (blk[counts[t] :] == m).all()
        rblk = rowid_p[base : base + n_chunks_o[t] * fr.CHUNK]
        np.testing.assert_array_equal(rblk[: counts[t]], lists[t])
        assert (rblk[counts[t] :] == r_sentinel).all()

    # slots past rows_used hold only culled instances (their rowid is the
    # caller's sentinel, so they gather the zero record) and m-padding
    tail_i = inst_p[rows_used * fr.CHUNK :]
    dead_ids = set(np.arange(m)[tile_id >= num_tiles]) | {m}
    assert set(tail_i.tolist()) <= dead_ids
    assert (rowid_p[rows_used * fr.CHUNK :] == r_sentinel).all()

    # row maps agree with ownership
    for r in range(max_rows):
        if r < rows_used:
            t = int(np.searchsorted(crs, r, side="right")) - 1
            while t + 1 < num_tiles and crs[t + 1] <= r and n_chunks_o[t] == 0:
                t += 1
            owner = row_tile[r]
            assert crs[owner] <= r < crs[owner] + n_chunks_o[owner]
            assert bool(row_first[r]) == (r == crs[owner])
            assert bool(row_last[r]) == (r == crs[owner] + n_chunks_o[owner] - 1)
        else:
            assert row_tile[r] == num_tiles

    # inversion: LIVE instance i's padded slot holds i. Dead (suffix)
    # instances may be cut from inst_padded entirely when
    # slots < m + padding; their map entries are unaddressed garbage.
    slot_of = np.asarray(
        fr.slot_of_inst_from_padded(jnp.asarray(inst_p), m)
    )
    live_ids = np.arange(m)[tile_id < num_tiles]
    if len(live_ids) and (live_ids == np.arange(len(live_ids))).all():
        np.testing.assert_array_equal(
            inst_p[slot_of[live_ids]], live_ids
        )


def test_random_mix():
    rng = np.random.default_rng(0)
    # 12 tiles, skewed occupancy, ~15% dead instances
    tile_id = rng.integers(0, 13, 700)  # id 12 == num_tiles == dead
    _check(tile_id, 12)


def test_exact_chunk_boundaries():
    # counts exactly at 0, CHUNK, 2*CHUNK
    tile_id = np.concatenate(
        [np.full(fr.CHUNK, 0), np.full(2 * fr.CHUNK, 2)]
    )
    rng = np.random.default_rng(1)
    rng.shuffle(tile_id)  # emission order random across tiles
    _check(tile_id, 4)


def test_all_one_tile_and_empty_tiles():
    _check(np.full(200, 3), 7)


def test_all_dead():
    _check(np.full(50, 5), 5)  # every instance dead (id == num_tiles)


def test_depth_order_is_preserved_within_tile():
    # interleave two tiles; relative order within each must survive
    tile_id = np.array([0, 1] * 100)
    _check(tile_id, 2)


def test_bucket_truncation_flags_overflow():
    # needs KROWS+2 rows but the bucket caps at KROWS: rows_used must
    # still report the TRUE requirement so the caller can flag + regrow
    tile_id = np.concatenate(
        [np.full(fr.CHUNK * (fr.KROWS + 1), 0), np.full(10, 1)]
    )
    m = len(tile_id)
    rowid = np.arange(m, dtype=np.int32)
    out = fr.pack_aligned(
        jnp.asarray(tile_id, jnp.int32), jnp.asarray(rowid), 2, fr.KROWS, m
    )
    rows_used = int(out[-1])
    assert rows_used == fr.KROWS + 2
    assert max(rows_used - fr.KROWS, 0) * fr.CHUNK == 2 * fr.CHUNK


@pytest.mark.parametrize("seed", [2, 3, 4])
def test_fuzz(seed):
    # production contract: dead instances are the SUFFIX of the buffer
    # (the expansion writes live instances at offs2-cumsum positions and
    # the capacity-bucket tail stays dead) — slot inversion relies on it
    # when the sorted tail is cut to slots
    rng = np.random.default_rng(seed)
    num_tiles = int(rng.integers(1, 20))
    live = int(rng.integers(1, 700))
    dead = int(rng.integers(0, 200))
    tile_id = np.concatenate(
        [rng.integers(0, num_tiles, live), np.full(dead, num_tiles)]
    )
    _check(tile_id, num_tiles)
