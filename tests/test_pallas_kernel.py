"""Pallas per-tile forward kernel vs the XLA tiled forward (interpret mode
on CPU; the same kernel compiles via Mosaic on real TPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgs_tpu.core import projection, transforms
from sgs_tpu.core.camera import Camera
from sgs_tpu.render import GaussianInputs, render


def make_camera(width=64, height=48, fovx=math.radians(60)):
    fovy = projection.focal2fov(projection.fov2focal(fovx, width), height)
    return Camera.from_Rt(np.eye(3), np.zeros(3), fovx, fovy, width, height)


def random_scene(n=80, seed=0):
    rng = np.random.default_rng(seed)
    means = np.stack(
        [rng.uniform(-1.2, 1.2, n), rng.uniform(-1.0, 1.0, n), rng.uniform(2, 8, n)],
        axis=-1,
    ).astype(np.float32)
    log_s = rng.uniform(-3.0, -1.4, (n, 3))
    log_s[: n // 8] = rng.uniform(-0.9, -0.4, (n // 8, 3))  # some big ones
    scales = np.exp(log_s).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opacity = rng.uniform(0.3, 0.99, (n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return means, scales, quats, opacity, colors


def inputs_of(scene):
    means, scales, quats, opacity, colors = scene
    return GaussianInputs(
        means3d=jnp.asarray(means), opacities=jnp.asarray(opacity),
        scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
        colors_precomp=jnp.asarray(colors),
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_forward_matches_xla(seed):
    cam = make_camera()
    scene = random_scene(90, seed=seed)
    bg = jnp.asarray([0.15, 0.3, 0.45], jnp.float32)
    xla = render(cam, inputs_of(scene), bg, mode="tiled", backend="xla")
    pal = render(cam, inputs_of(scene), bg, mode="tiled", backend="pallas")
    np.testing.assert_allclose(
        np.asarray(pal["render"]), np.asarray(xla["render"]), atol=3e-5
    )


def test_pallas_gradients_via_shared_backward():
    """Gradients with the Pallas forward (its t_final/last_contrib feed the
    shared custom backward) must match XLA-forward gradients."""
    cam = make_camera(width=48, height=32)
    scene = random_scene(50, seed=5)
    bg = jnp.zeros(3)
    target = np.random.default_rng(7).uniform(size=(3, 32, 48)).astype(np.float32)

    def loss(backend, m, s, q, o, c):
        out = render(
            cam, GaussianInputs(
                means3d=m, opacities=o, scales=s, rotations=q, colors_precomp=c,
            ), bg, mode="tiled", backend=backend,
        )
        return jnp.mean(jnp.abs(out["render"] - target))

    args = tuple(jnp.asarray(x) for x in (scene[0], scene[1], scene[2], scene[3], scene[4]))
    g_x = jax.grad(lambda *a: loss("xla", *a), argnums=tuple(range(5)))(*args)
    g_p = jax.grad(lambda *a: loss("pallas", *a), argnums=tuple(range(5)))(*args)
    for gx, gp in zip(g_x, g_p):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-7)


def test_pallas_empty_and_saturated_tiles():
    """Empty tiles -> pure background; a stack of opaque gaussians on one
    tile exercises the early-termination path."""
    cam = make_camera(width=32, height=32)
    n = 40
    means = np.tile(np.array([[0.0, 0.0, 3.0]], np.float32), (n, 1))
    means[:, 2] += np.linspace(0, 0.5, n)
    scales = np.full((n, 3), 0.05, np.float32)
    quats = np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1))
    opacity = np.full((n, 1), 0.95, np.float32)
    colors = np.linspace(0, 1, n * 3).reshape(n, 3).astype(np.float32)
    bg = jnp.asarray([1.0, 0.0, 0.5], jnp.float32)
    scene = (means, scales, quats, opacity, colors)
    xla = render(cam, inputs_of(scene), bg, mode="tiled", backend="xla")
    pal = render(cam, inputs_of(scene), bg, mode="tiled", backend="pallas")
    np.testing.assert_allclose(
        np.asarray(pal["render"]), np.asarray(xla["render"]), atol=3e-5
    )
    # corners are background
    np.testing.assert_allclose(np.asarray(pal["render"])[:, 0, 0], np.asarray(bg), rtol=1e-6)


def test_pallas_gradients_moment_mxu(monkeypatch):
    """MOMENT_MXU backward (single-matmul moment reductions with the
    binomial shift to instance-centered moments) must match the direct
    VPU reductions to f32-cancellation tolerance."""
    from sgs_tpu.ops.pallas import flat_raster as fr

    cam = make_camera(width=48, height=32)
    scene = random_scene(50, seed=5)
    bg = jnp.zeros(3)
    target = np.random.default_rng(7).uniform(size=(3, 32, 48)).astype(np.float32)

    def loss(m, s, q, o, c):
        out = render(
            cam, GaussianInputs(
                means3d=m, opacities=o, scales=s, rotations=q,
                colors_precomp=c,
            ), bg, mode="tiled", backend="pallas",
        )
        return jnp.mean(jnp.abs(out["render"] - target))

    args = tuple(jnp.asarray(x) for x in scene)
    g_ref = jax.grad(loss, argnums=tuple(range(5)))(*args)
    monkeypatch.setattr(fr, "MOMENT_MXU", True)
    jax.clear_caches()
    g_mxu = jax.grad(loss, argnums=tuple(range(5)))(*args)
    jax.clear_caches()
    for gr, gm in zip(g_ref, g_mxu):
        scale = max(float(jnp.max(jnp.abs(gr))), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gm), np.asarray(gr), atol=2e-4 * scale, rtol=0
        )
