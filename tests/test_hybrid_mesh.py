"""2D hybrid mesh (camera-DP x Gaussian-shard) vs single-device training
math, on the virtual 8-device CPU mesh arranged (data=2, gauss=4)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from sgs_tpu.core.camera import Camera
from sgs_tpu.core.projection import focal2fov, fov2focal
from sgs_tpu.models.gaussians import GaussianPool
from sgs_tpu.ops.ssim import l1_loss, ssim
from sgs_tpu.parallel.data_parallel import stack_cameras
from sgs_tpu.parallel.hybrid import make_hybrid_render, shard_hybrid
from sgs_tpu.parallel.mesh import make_mesh
from sgs_tpu.render import render


def make_setup(width=64, height=64, n=80, capacity=128):
    rng = np.random.default_rng(1)
    pts = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(2.5, 6, n)], -1
    ).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    pool = GaussianPool.from_pcd(pts, cols, 1, capacity=capacity)
    fovx = math.radians(60)
    fovy = focal2fov(fov2focal(fovx, width), height)
    cams, gts = [], []
    for i in range(2):
        th = math.pi * i / 2
        R = np.array(
            [[math.cos(th), 0, math.sin(th)], [0, 1, 0], [-math.sin(th), 0, math.cos(th)]]
        )
        cams.append(Camera.from_Rt(R, np.array([0.0, 0.0, 3.5]), fovx, fovy, width, height))
        gts.append(rng.uniform(size=(3, height, width)).astype(np.float32))
    return pool, cams, np.stack(gts)


def test_hybrid_render_and_loss_grads_match_unsharded():
    pool, cams, gts = make_setup()
    mesh = make_mesh((2, 4), ("data", "gauss"))
    bg = jnp.zeros(3)
    fn = make_hybrid_render(mesh, 64, 64, 1, max_instances_per_band=8192)
    cam_batch = stack_cameras(cams)
    params, alive, cam_b, gt_b = shard_hybrid(
        pool.params(), pool.alive, cam_batch, jnp.asarray(gts), mesh
    )

    # images match per-camera single-device renders
    imgs = np.asarray(jax.jit(fn)(params, alive, cam_b, bg))
    for i, cam in enumerate(cams):
        ref = render(cam, pool.render_inputs(1), bg, mode="tiled")["render"]
        np.testing.assert_allclose(imgs[i], np.asarray(ref), atol=3e-5)

    # full training loss (L1 + SSIM with GSPMD-partitioned convs) grads
    def hybrid_loss(params):
        img = fn(params, alive, cam_b, bg)
        l1 = l1_loss(img, gt_b)
        s = (ssim(img[0], gt_b[0]) + ssim(img[1], gt_b[1])) / 2
        return 0.8 * l1 + 0.2 * (1 - s)

    def ref_loss(params):
        p = pool.with_params(params)
        total = 0.0
        for cam, gt in zip(cams, gts):
            out = render(cam, p.render_inputs(1), bg, mode="tiled")
            img = out["render"]
            total += 0.8 * l1_loss(img, jnp.asarray(gt)) + 0.2 * (
                1 - ssim(img, jnp.asarray(gt))
            )
        return total / 2

    g_h = jax.jit(jax.grad(hybrid_loss))(params)
    g_r = jax.grad(ref_loss)(pool.params())
    for k in g_r:
        np.testing.assert_allclose(
            np.asarray(g_h[k]), np.asarray(g_r[k]) / 1.0, rtol=3e-3, atol=5e-6
        )

def make_front_loaded_setup(width=128, height=256, n=1500, capacity=2048):
    """A deliberately FRONT-LOADED scene: splat density decreases
    linearly from the top of the frame (target pixel rows drawn with
    u = 1 - sqrt(v), inverted through the projection), so equal-height
    bands overload the top chip while balanced boundaries can equalize."""
    rng = np.random.default_rng(3)
    fovx = math.radians(60)
    fovy = focal2fov(fov2focal(fovx, width), height)
    tanfovy = math.tan(fovy / 2)
    cam_z = 3.0
    v = rng.uniform(0, 1, n)
    frac = 1.0 - np.sqrt(v)  # density 2(1-u): linearly decreasing
    depth = rng.uniform(2.7, 3.3, n)
    y_world = (frac * 2.0 - 1.0) * depth * tanfovy
    pts = np.stack(
        [rng.uniform(-1, 1, n) * depth / 3.0, y_world, depth - cam_z], -1
    ).astype(np.float32)
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    pool = GaussianPool.from_pcd(pts, cols, 1, capacity=capacity)
    cams = [
        Camera.from_Rt(
            np.eye(3), np.array([0.0, 0.0, cam_z + 0.1 * i]),
            fovx, fovy, width, height,
        )
        for i in range(2)
    ]
    return pool, cams


def test_balanced_bands_load_and_parity():
    """VERDICT r3 #7: cumulative-load band boundaries keep max/mean band
    load <= 1.2x on a front-loaded scene where equal-height bands idle
    3 of 4 chips — and the balanced hybrid render stays exact."""
    from sgs_tpu.core.projection import TILE, project_gaussians
    from sgs_tpu.parallel.tile_shard import (
        balanced_band_offsets, row_load_histogram,
    )

    width, height, n_bands = 128, 256, 4
    pool, cams = make_front_loaded_setup(width, height)
    cam = cams[0]
    proj = project_gaussians(
        pool.xyz, pool.get_covariance(), cam.world_view_transform,
        cam.full_proj_transform, cam.tanfovx, cam.tanfovy, width, height,
    )
    valid = (proj["radius"] > 0) & pool.alive
    hist = np.asarray(
        row_load_histogram(proj["mean2d"], proj["radius"], valid,
                           width, height)
    )
    tiles_y = height // TILE
    assert hist.shape == (tiles_y,) and hist.sum() > 0

    offsets, pad_tiles = balanced_band_offsets(hist, n_bands)
    assert offsets[0] == 0 and np.all(np.diff(offsets) >= 1)
    nxt = np.concatenate([offsets[1:], [tiles_y]])
    loads_bal = np.array(
        [hist[offsets[b]:nxt[b]].sum() for b in range(n_bands)], np.float64
    )
    eq = tiles_y // n_bands
    loads_eq = np.array(
        [hist[b * eq:(b + 1) * eq].sum() for b in range(n_bands)], np.float64
    )
    assert loads_eq.max() / loads_eq.mean() > 1.5  # scene IS front-loaded
    assert loads_bal.max() / loads_bal.mean() <= 1.2

    # parity: the balanced hybrid render (traced offsets, padded band
    # viewports, overwrite assembly) matches the single-chip render
    mesh = make_mesh((2, 4), ("data", "gauss"))
    bg = jnp.zeros(3)
    fn = make_hybrid_render(
        mesh, width, height, 1, max_instances_per_band=16384,
        band_pad_tiles=pad_tiles,
    )
    cam_batch = stack_cameras(cams)
    params, alive, cam_b, _ = shard_hybrid(
        pool.params(), pool.alive, cam_batch,
        jnp.zeros((2, 3, height, width)), mesh,
    )
    imgs = np.asarray(
        jax.jit(fn)(params, alive, cam_b, bg, jnp.asarray(offsets))
    )
    for i, c in enumerate(cams):
        ref = render(c, pool.render_inputs(1), bg, mode="tiled")["render"]
        np.testing.assert_allclose(imgs[i], np.asarray(ref), atol=3e-5)


def test_balanced_bands_train_step_matches_equal_bands():
    """The balanced-band hybrid TRAIN step (ownership cull + overwrite
    assembly + traced offsets) computes the same loss/grads as the
    legacy equal-band step."""
    from sgs_tpu.parallel.hybrid import make_hybrid_train_step
    from sgs_tpu.models.gaussians import DensifyStats
    from sgs_tpu.train.loop import TrainState
    from sgs_tpu.train.optim import AdamState

    width = height = 64
    pool, cams, gts = make_setup(width, height)
    mesh = make_mesh((2, 4), ("data", "gauss"))
    bg = jnp.zeros(3)
    cam_batch = stack_cameras(cams)
    params, alive, cam_b, gt_b = shard_hybrid(
        pool.params(), pool.alive, cam_batch, jnp.asarray(gts), mesh
    )
    state = TrainState(
        pool=pool, adam=AdamState.init(pool.params()),
        stats=DensifyStats.zeros(pool.capacity),
    )
    lrs = {k: 1e-3 for k in pool.params()}

    step_eq = make_hybrid_train_step(
        mesh, 1, width, height, max_instances_per_band=8192,
        apply_update=True,
    )
    # pad_tiles = 2 > the equal band height (1 tile row): exercises the
    # overhang-overwrite path with offsets 0,1,2,3
    step_bal = make_hybrid_train_step(
        mesh, 1, width, height, max_instances_per_band=8192,
        apply_update=True, band_pad_tiles=2,
    )
    offs = jnp.arange(4, dtype=jnp.int32)

    s1, m1 = step_eq(state, cam_b, gt_b, bg, lrs)
    s2, m2 = step_bal(state, cam_b, gt_b, bg, lrs, offs)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
    for k in s1.pool.params():
        np.testing.assert_allclose(
            np.asarray(s1.pool.params()[k]), np.asarray(s2.pool.params()[k]),
            rtol=1e-5, atol=1e-7,
        )


def test_band_bucket_sample_sizes_tight_band_path():
    """band_bucket_sample buckets admit an overflow-free tight render:
    the tight band compositor (exact ellipse culling inside each band)
    must match the rect band path and the unsharded render."""
    import random

    from sgs_tpu.parallel.hybrid import band_bucket_sample

    pool, cams, _ = make_setup()
    mesh = make_mesh((2, 4), ("data", "gauss"))
    bg = jnp.zeros(3)
    py_rng = random.Random(0)

    rect_b = band_bucket_sample(pool, cams, py_rng, 4, tight=False)
    assert rect_b >= 256 and rect_b & (rect_b - 1) == 0  # pow2

    inst_b, row_b, krow_b = band_bucket_sample(pool, cams, py_rng, 4, tight=True)
    assert inst_b > 0 and row_b > 0 and krow_b % 1024 == 0
    assert inst_b <= rect_b  # tight culling never needs more than rect

    fn = make_hybrid_render(
        mesh, 64, 64, 1, max_instances_per_band=inst_b,
        max_row_instances_per_band=row_b, max_kernel_rows_per_band=krow_b,
    )
    cam_batch = stack_cameras(cams)
    params, alive, cam_b, _ = shard_hybrid(
        pool.params(), pool.alive, cam_batch, jnp.zeros((2, 3, 64, 64)), mesh
    )
    imgs = np.asarray(jax.jit(fn)(params, alive, cam_b, bg))
    for i, cam in enumerate(cams):
        ref = render(cam, pool.render_inputs(1), bg, mode="tiled")["render"]
        np.testing.assert_allclose(imgs[i], np.asarray(ref), atol=3e-5)


def test_band_compact_render_and_train_parity():
    """VERDICT r3 #8: band record compaction (each band bins only its
    ownership-culled records, in a band_record_cap buffer) is exact —
    same images as the single-chip render and same loss/grads as the
    uncompacted hybrid step."""
    import random

    from sgs_tpu.models.gaussians import DensifyStats
    from sgs_tpu.parallel.hybrid import band_record_cap, make_hybrid_train_step
    from sgs_tpu.train.loop import TrainState
    from sgs_tpu.train.optim import AdamState

    width = height = 64
    pool, cams, gts = make_setup(width, height)
    mesh = make_mesh((2, 4), ("data", "gauss"))
    bg = jnp.zeros(3)
    py_rng = random.Random(0)

    rec_cap = band_record_cap(pool, cams, py_rng, 4)
    # bucket floor (4096) out-sizes the toy pool, so the cap clamps to
    # capacity here; the shrink itself is measured in
    # scripts/exp_hybrid_overhead.py at real scale
    assert 0 < rec_cap <= pool.capacity

    fn = make_hybrid_render(
        mesh, width, height, 1, max_instances_per_band=8192,
        band_rec_cap=rec_cap,
    )
    cam_batch = stack_cameras(cams)
    params, alive, cam_b, gt_b = shard_hybrid(
        pool.params(), pool.alive, cam_batch, jnp.asarray(gts), mesh
    )
    imgs = np.asarray(jax.jit(fn)(params, alive, cam_b, bg))
    for i, cam in enumerate(cams):
        ref = render(cam, pool.render_inputs(1), bg, mode="tiled")["render"]
        np.testing.assert_allclose(imgs[i], np.asarray(ref), atol=3e-5)

    state = TrainState(
        pool=pool, adam=AdamState.init(pool.params()),
        stats=DensifyStats.zeros(pool.capacity),
    )
    lrs = {k: 1e-3 for k in pool.params()}
    step_ref = make_hybrid_train_step(
        mesh, 1, width, height, max_instances_per_band=8192,
        apply_update=True,
    )
    step_c = make_hybrid_train_step(
        mesh, 1, width, height, max_instances_per_band=8192,
        apply_update=True, band_rec_cap=rec_cap,
    )
    s1, m1 = step_ref(state, cam_b, gt_b, bg, lrs)
    s2, m2 = step_c(state, cam_b, gt_b, bg, lrs)
    assert int(m2["overflow"]) == 0
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for k in s1.pool.params():
        np.testing.assert_allclose(
            np.asarray(s1.pool.params()[k]), np.asarray(s2.pool.params()[k]),
            rtol=1e-5, atol=1e-7,
        )
    # densify stats (driven by the NDC tap through the compaction
    # scatter's transpose) must survive compaction too
    np.testing.assert_allclose(
        np.asarray(s1.stats.xyz_gradient_accum),
        np.asarray(s2.stats.xyz_gradient_accum), rtol=1e-4, atol=1e-8,
    )


def test_band_compact_overflow_reported():
    """A deliberately-too-small record cap must flag overflow instead of
    silently dropping splats."""
    from sgs_tpu.models.gaussians import DensifyStats
    from sgs_tpu.parallel.hybrid import make_hybrid_train_step
    from sgs_tpu.train.loop import TrainState
    from sgs_tpu.train.optim import AdamState

    width = height = 64
    pool, cams, gts = make_setup(width, height)
    mesh = make_mesh((2, 4), ("data", "gauss"))
    cam_batch = stack_cameras(cams)
    params, alive, cam_b, gt_b = shard_hybrid(
        pool.params(), pool.alive, cam_batch, jnp.asarray(gts), mesh
    )
    state = TrainState(
        pool=pool, adam=AdamState.init(pool.params()),
        stats=DensifyStats.zeros(pool.capacity),
    )
    lrs = {k: 1e-3 for k in pool.params()}
    step = make_hybrid_train_step(
        mesh, 1, width, height, max_instances_per_band=8192,
        apply_update=False, band_rec_cap=8,
    )
    _, m = step(state, cam_b, gt_b, jnp.zeros(3), lrs)
    assert int(m["overflow"]) > 0
