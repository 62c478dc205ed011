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
