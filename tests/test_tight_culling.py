"""Tight (exact ellipse/tile) binning: parity vs the rect path.

The tight expansion (render/tiled.py:_expand_instances_tight) culls
(Gaussian, tile) pairs whose alpha is < 1/255 at every tile pixel — those
contribute exactly zero in the kernels (and in the CUDA reference design,
whose per-pixel test drops a < 1/255; see upstream forward.cu semantics at
/root/reference's rasterizer call site gaussian_renderer/__init__.py:51).
Images must therefore match the rect path to f32 summation-order noise,
and gradients to the same tolerance the rect path matches the oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgs_tpu.render.tiled import (
    instance_count,
    instance_count_tight,
    rasterize_tiled,
    row_count,
)


def _random_scene(seed, n=400, w=96, h=80):
    rng = np.random.default_rng(seed)
    mean2d = jnp.asarray(
        rng.uniform(-10, [w + 10, h + 10], (n, 2)).astype(np.float32)
    )
    depth = jnp.asarray(rng.uniform(0.5, 10.0, n).astype(np.float32))
    l1 = rng.uniform(0.002, 0.5, n)
    l2 = rng.uniform(0.002, 0.5, n)
    th = rng.uniform(0, np.pi, n)
    c, s = np.cos(th), np.sin(th)
    conic = np.stack(
        [l1 * c * c + l2 * s * s, (l1 - l2) * s * c, l1 * s * s + l2 * c * c],
        axis=1,
    ).astype(np.float32)
    conic = jnp.asarray(conic)
    rgb = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    # include opacities below 1/255 (tight culls them entirely)
    opac = jnp.asarray(rng.uniform(0.001, 0.99, n).astype(np.float32))
    radius = jnp.asarray(
        np.ceil(3.0 / np.sqrt(np.minimum(l1, l2))).astype(np.int32)
    )
    valid = jnp.asarray(rng.uniform(size=n) > 0.1)
    bg = jnp.asarray(rng.uniform(0, 1, 3).astype(np.float32))
    return mean2d, depth, conic, rgb, opac, radius, valid, bg, w, h


@pytest.mark.parametrize("seed", [0, 7])
def test_tight_matches_rect(seed):
    mean2d, depth, conic, rgb, opac, radius, valid, bg, w, h = _random_scene(
        seed
    )
    mi = int(instance_count(mean2d, radius, valid, w, h)) + 64
    rc = int(row_count(mean2d, radius, valid, w, h)) + 16
    ti = int(
        instance_count_tight(
            mean2d, conic, opac, depth, radius, valid, w, h, rc
        )
    )
    assert 0 < ti < mi - 64, "tight culling should drop instances"

    def run(max_instances, max_row_instances):
        def f(m2, cn, rg, op, b):
            img, ovf = rasterize_tiled(
                m2, depth, cn, rg, op, radius, valid, b, w, h,
                max_instances=max_instances, backend="pallas",
                max_row_instances=max_row_instances,
            )
            return img, ovf

        img, ovf = f(mean2d, conic, rgb, opac, bg)
        _, vjp_fn = jax.vjp(lambda *a: f(*a)[0], mean2d, conic, rgb, opac, bg)
        return img, int(ovf), vjp_fn

    img_r, ovf_r, vjp_r = run(mi, 0)
    img_t, ovf_t, vjp_t = run(-(-ti // 256) * 256 + 256, rc)
    assert ovf_r == 0 and ovf_t == 0

    # identical composited sets -> equal up to f32 summation order
    np.testing.assert_allclose(
        np.asarray(img_t), np.asarray(img_r), atol=3e-6, rtol=0
    )

    ct = jnp.asarray(
        np.random.default_rng(seed + 1)
        .standard_normal((3, h, w))
        .astype(np.float32)
    )
    g_r = vjp_r(ct)
    g_t = vjp_t(ct)
    names = ["mean2d", "conic", "rgb", "opac", "bg"]
    for gr, gt_, name in zip(g_r, g_t, names):
        scale = max(float(jnp.max(jnp.abs(gr))), 1.0)
        np.testing.assert_allclose(
            np.asarray(gt_), np.asarray(gr), atol=3e-3 * scale, rtol=0,
            err_msg=f"grad {name}",
        )


def test_row_overflow_reported():
    mean2d, depth, conic, rgb, opac, radius, valid, bg, w, h = _random_scene(3)
    rc_full = int(row_count(mean2d, radius, valid, w, h))
    rc = max(16, rc_full // 2)  # force row overflow
    ti = int(
        instance_count_tight(
            mean2d, conic, opac, depth, radius, valid, w, h, rc
        )
    )
    _, ovf = rasterize_tiled(
        mean2d, depth, conic, rgb, opac, radius, valid, bg, w, h,
        max_instances=-(-ti // 256) * 256 + 256, backend="pallas",
        max_row_instances=rc,
    )
    assert int(ovf) >= rc_full - rc


def test_tight_count_matches_build():
    """instance_count_tight agrees with the live-instance total of the
    actual tight expansion."""
    from sgs_tpu.render.tiled import _expand_instances_tight

    mean2d, depth, conic, rgb, opac, radius, valid, bg, w, h = _random_scene(5)
    rc = int(row_count(mean2d, radius, valid, w, h)) + 16
    ti = int(
        instance_count_tight(
            mean2d, conic, opac, depth, radius, valid, w, h, rc
        )
    )
    m = -(-ti // 256) * 256 + 512
    (tile_id, rowid, grank, offs2_ptr, rank_rows, order, ovf,
     num_tiles, tx, ty, _payload) = (
        _expand_instances_tight(
            mean2d, conic, opac, depth, radius, valid, w, h, m, rc
        )
    )
    assert int(ovf) == 0
    assert int(jnp.sum(tile_id < num_tiles)) == ti


def test_tight_scatter_reduction_matches(monkeypatch):
    """The garden-scale scatter-add gradient reduction (keyed on the
    merged payload's id lane) must match the presort-contiguous
    reduction to f32 summation order."""
    import sgs_tpu.render.tiled as tiled_mod

    mean2d, depth, conic, rgb, opac, radius, valid, bg, w, h = _random_scene(2)
    rc = int(row_count(mean2d, radius, valid, w, h)) + 16
    ti = int(
        instance_count_tight(
            mean2d, conic, opac, depth, radius, valid, w, h, rc
        )
    )
    mi = -(-ti // 256) * 256 + 256

    def run():
        def f(m2, cn, rg, op, b):
            img, ovf = rasterize_tiled(
                m2, depth, cn, rg, op, radius, valid, b, w, h,
                max_instances=mi, backend="pallas", max_row_instances=rc,
            )
            return img, ovf

        img, ovf = f(mean2d, conic, rgb, opac, bg)
        ct = jnp.asarray(
            np.random.default_rng(11).standard_normal((3, h, w))
            .astype(np.float32)
        )
        _, vjp_fn = jax.vjp(lambda *a: f(*a)[0], mean2d, conic, rgb, opac, bg)
        return np.asarray(img), int(ovf), [np.asarray(g) for g in vjp_fn(ct)]

    img_one, ovf_one, g_one = run()
    monkeypatch.setattr(tiled_mod, "REDUCE_SCATTER_SLOTS", 0)
    img_two, ovf_two, g_two = run()
    assert ovf_one == ovf_two == 0
    np.testing.assert_array_equal(img_two, img_one)
    for ga, gb in zip(g_one, g_two):
        scale = max(np.abs(ga).max(), 1.0)
        np.testing.assert_allclose(gb, ga, atol=2e-6 * scale, rtol=0)


def test_slabbed_matches_single_pass():
    """rasterize_slabbed (sequential slab loop, 5M-regime path) must
    reproduce the single-pass image and gradients exactly up to f32
    summation order."""
    from sgs_tpu.render.tiled import rasterize_slabbed

    mean2d, depth, conic, rgb, opac, radius, valid, bg, w, h = _random_scene(4)
    rc = int(row_count(mean2d, radius, valid, w, h)) + 64
    ti = int(instance_count_tight(
        mean2d, conic, opac, depth, radius, valid, w, h, rc
    ))
    mi = -(-ti // 256) * 256 + 512

    def f_single(m2, cn, rg, op, b):
        img, ovf = rasterize_tiled(
            m2, depth, cn, rg, op, radius, valid, b, w, h,
            max_instances=mi, backend="pallas", max_row_instances=rc,
        )
        return img, ovf

    def f_slab(m2, cn, rg, op, b):
        img, ovf = rasterize_slabbed(
            m2, depth, cn, rg, op, radius, valid, b, w, h, 2,
            max_instances=mi, backend="pallas", max_row_instances=rc,
        )
        return img, ovf

    img_1, ovf_1 = f_single(mean2d, conic, rgb, opac, bg)
    img_2, ovf_2 = f_slab(mean2d, conic, rgb, opac, bg)
    assert int(ovf_1) == 0 and int(ovf_2) == 0
    np.testing.assert_allclose(
        np.asarray(img_2), np.asarray(img_1), atol=3e-6, rtol=0
    )

    ct = jnp.asarray(
        np.random.default_rng(9).standard_normal(img_1.shape)
        .astype(np.float32)
    )
    _, vjp_1 = jax.vjp(lambda *a: f_single(*a)[0], mean2d, conic, rgb, opac, bg)
    _, vjp_2 = jax.vjp(lambda *a: f_slab(*a)[0], mean2d, conic, rgb, opac, bg)
    for g1, g2 in zip(vjp_1(ct), vjp_2(ct)):
        scale = max(float(jnp.max(jnp.abs(g1))), 1.0)
        np.testing.assert_allclose(
            np.asarray(g2), np.asarray(g1), atol=3e-5 * scale, rtol=0
        )


def test_split_payload_matches_single_table(monkeypatch):
    """The split (two 8-lane halves) payload path — chosen above
    SPLIT_ATTR_TABLE_ROWS, i.e. only at garden scale in production —
    must produce bit-identical images and summation-order-equal grads
    to the single (R+1, 16)-table path."""
    import sgs_tpu.render.tiled as tiled_mod

    mean2d, depth, conic, rgb, opac, radius, valid, bg, w, h = _random_scene(3)
    rc = int(row_count(mean2d, radius, valid, w, h)) + 16
    ti = int(
        instance_count_tight(
            mean2d, conic, opac, depth, radius, valid, w, h, rc
        )
    )
    mi = -(-ti // 256) * 256 + 256

    def run():
        def f(m2, cn, rg, op, b):
            img, ovf = rasterize_tiled(
                m2, depth, cn, rg, op, radius, valid, b, w, h,
                max_instances=mi, backend="pallas", max_row_instances=rc,
            )
            return img, ovf

        img, ovf = f(mean2d, conic, rgb, opac, bg)
        ct = jnp.asarray(
            np.random.default_rng(7).standard_normal((3, h, w))
            .astype(np.float32)
        )
        _, vjp_fn = jax.vjp(lambda *a: f(*a)[0], mean2d, conic, rgb, opac, bg)
        return np.asarray(img), int(ovf), [np.asarray(g) for g in vjp_fn(ct)]

    img_one, ovf_one, g_one = run()
    monkeypatch.setattr(tiled_mod, "SPLIT_ATTR_TABLE_ROWS", 0)
    # rasterize_tiled is jitted at def site and closes over the module
    # global: without a cache clear the patched threshold would never
    # retrace and this test would compare a cached trace to itself
    jax.clear_caches()
    img_two, ovf_two, g_two = run()
    assert ovf_one == ovf_two == 0
    np.testing.assert_array_equal(img_two, img_one)
    for ga, gb in zip(g_one, g_two):
        scale = max(np.abs(ga).max(), 1.0)
        np.testing.assert_allclose(gb, ga, atol=2e-6 * scale, rtol=0)


def test_visible_compaction_matches_and_overflows():
    """max_visible compaction (binning at visible-count scale instead
    of pool capacity) is exact: same image, same input grads routed
    back to ORIGINAL indices through the scatter transpose; an
    undersized bucket reports overflow."""
    from sgs_tpu.render.tiled import visible_count

    mean2d, depth, conic, rgb, opac, radius, valid, bg, w, h = _random_scene(5)
    # kill a third of the scene (a dead pool tail + off-screen culls)
    n = mean2d.shape[0]
    valid = valid & (np.arange(n) % 3 != 0)
    rc = int(row_count(mean2d, radius, valid, w, h)) + 16
    ti = int(
        instance_count_tight(
            mean2d, conic, opac, depth, radius, valid, w, h, rc
        )
    )
    mi = -(-ti // 256) * 256 + 256
    nv = int(visible_count(mean2d, radius, valid, w, h))
    assert 0 < nv < n
    cap = -(-nv // 128) * 128

    def run(mv):
        def f(m2, cn, rg, op, b):
            img, ovf = rasterize_tiled(
                m2, depth, cn, rg, op, radius, valid, b, w, h,
                max_instances=mi, backend="pallas", max_row_instances=rc,
                max_visible=mv,
            )
            return img, ovf

        img, ovf = f(mean2d, conic, rgb, opac, bg)
        ct = jnp.asarray(
            np.random.default_rng(13).standard_normal((3, h, w))
            .astype(np.float32)
        )
        _, vjp_fn = jax.vjp(lambda *a: f(*a)[0], mean2d, conic, rgb, opac, bg)
        return np.asarray(img), int(ovf), [np.asarray(g) for g in vjp_fn(ct)]

    img_ref, ovf_ref, g_ref = run(0)
    img_c, ovf_c, g_c = run(cap)
    assert ovf_ref == ovf_c == 0
    np.testing.assert_allclose(img_c, img_ref, atol=1e-6)
    for ga, gb in zip(g_ref, g_c):
        scale = max(np.abs(ga).max(), 1.0)
        np.testing.assert_allclose(gb, ga, atol=2e-6 * scale, rtol=0)
    # grads of dead/invalid gaussians are zero after compaction routing
    dead = ~np.asarray(valid)
    assert np.abs(g_c[0][dead]).max() == 0.0

    # an undersized visible bucket must flag, not silently drop
    _, ovf_small = jax.jit(
        lambda: rasterize_tiled(
            mean2d, depth, conic, rgb, opac, radius, valid, bg, w, h,
            max_instances=mi, backend="pallas", max_row_instances=rc,
            max_visible=128,
        )
    )()
    assert int(ovf_small) > 0


def test_two_gather_cull_matches_merged(monkeypatch):
    """The two-gather culling dispatch (chosen at or below
    TWO_GATHER_MAX_ROWS — the 100k/bench regime) and the merged-payload
    derivation (garden regime) must agree BIT-identically: same
    formulas, same inputs, different data flow (N-scale precompute +
    8-lane cull gather vs R-scale elementwise rederivation)."""
    import sgs_tpu.render.tiled as tiled_mod

    mean2d, depth, conic, rgb, opac, radius, valid, bg, w, h = _random_scene(11)
    rc = int(row_count(mean2d, radius, valid, w, h)) + 16
    ti = int(
        instance_count_tight(
            mean2d, conic, opac, depth, radius, valid, w, h, rc
        )
    )
    mi = -(-ti // 256) * 256 + 256

    def run():
        def f(m2, cn, rg, op, b):
            img, ovf = rasterize_tiled(
                m2, depth, cn, rg, op, radius, valid, b, w, h,
                max_instances=mi, backend="pallas", max_row_instances=rc,
            )
            return img, ovf

        img, ovf = f(mean2d, conic, rgb, opac, bg)
        ct = jnp.asarray(
            np.random.default_rng(5).standard_normal((3, h, w))
            .astype(np.float32)
        )
        _, vjp_fn = jax.vjp(lambda *a: f(*a)[0], mean2d, conic, rgb, opac, bg)
        return np.asarray(img), int(ovf), [np.asarray(g) for g in vjp_fn(ct)]

    # counts must also agree across the dispatch (pre-passes size buckets)
    img_two, ovf_two, g_two = run()
    monkeypatch.setattr(tiled_mod, "TWO_GATHER_MAX_ROWS", 0)
    jax.clear_caches()  # jitted def-site closures; see split test above
    ti_merged = int(
        instance_count_tight(
            mean2d, conic, opac, depth, radius, valid, w, h, rc
        )
    )
    assert ti_merged == ti
    img_one, ovf_one, g_one = run()
    assert ovf_one == ovf_two == 0
    np.testing.assert_array_equal(img_two, img_one)
    for ga, gb in zip(g_one, g_two):
        np.testing.assert_array_equal(gb, ga)


@pytest.mark.parametrize(
    "flag,value",
    [
        ("PAYLOAD_LANES", 12),
        ("PACK_BARRIER", True),
        ("GRAD_SINGLE_TABLE", True),
    ],
)
def test_perf_flag_variants_match_default(monkeypatch, flag, value):
    """The device-measurable layout flags (narrow payload tables, pack
    barrier, single grad-reduction buffer) are pure data-layout changes:
    images AND grads must match the default path bit-for-bit."""
    import sgs_tpu.render.tiled as tiled_mod

    mean2d, depth, conic, rgb, opac, radius, valid, bg, w, h = _random_scene(17)
    rc = int(row_count(mean2d, radius, valid, w, h)) + 16
    ti = int(
        instance_count_tight(
            mean2d, conic, opac, depth, radius, valid, w, h, rc
        )
    )
    mi = -(-ti // 256) * 256 + 256

    def run():
        def f(m2, cn, rg, op, b):
            img, ovf = rasterize_tiled(
                m2, depth, cn, rg, op, radius, valid, b, w, h,
                max_instances=mi, backend="pallas", max_row_instances=rc,
            )
            return img, ovf

        img, ovf = f(mean2d, conic, rgb, opac, bg)
        ct = jnp.asarray(
            np.random.default_rng(3).standard_normal((3, h, w))
            .astype(np.float32)
        )
        _, vjp_fn = jax.vjp(lambda *a: f(*a)[0], mean2d, conic, rgb, opac, bg)
        return np.asarray(img), int(ovf), [np.asarray(g) for g in vjp_fn(ct)]

    img_def, ovf_def, g_def = run()
    monkeypatch.setattr(tiled_mod, flag, value)
    jax.clear_caches()
    img_var, ovf_var, g_var = run()
    assert ovf_def == ovf_var == 0
    np.testing.assert_array_equal(img_var, img_def)
    for ga, gb in zip(g_def, g_var):
        if flag == "GRAD_SINGLE_TABLE":
            # the single-buffer reduction lane-packs 8 records per
            # 128-lane row instead of 16: a different f32 addition tree,
            # so grads match to summation-order noise, not bit-exact
            scale = max(np.abs(ga).max(), 1.0)
            np.testing.assert_allclose(gb, ga, atol=2e-6 * scale, rtol=0)
        else:
            np.testing.assert_array_equal(gb, ga)
