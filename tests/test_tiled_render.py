"""Tiled production rasterizer vs the reference oracle: images AND
gradients must agree (the allclose contract of BASELINE.md)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgs_tpu.core import projection, transforms
from sgs_tpu.core.camera import Camera
from sgs_tpu.render import GaussianInputs, render
from sgs_tpu.render.tiled import instance_count, rasterize_tiled


def make_camera(width=80, height=64, fovx=math.radians(60)):
    fovy = projection.focal2fov(projection.fov2focal(fovx, width), height)
    return Camera.from_Rt(np.eye(3), np.zeros(3), fovx, fovy, width, height)


def random_scene(n=120, seed=0, spread=1.2, zmin=2.0, zmax=8.0, big_frac=0.1):
    rng = np.random.default_rng(seed)
    means = np.stack(
        [
            rng.uniform(-spread, spread, n),
            rng.uniform(-spread, spread, n),
            rng.uniform(zmin, zmax, n),
        ],
        axis=-1,
    ).astype(np.float32)
    log_s = rng.uniform(-3.0, -1.2, (n, 3))
    # a few big gaussians spanning many tiles
    nbig = max(1, int(n * big_frac))
    log_s[:nbig] = rng.uniform(-0.8, -0.2, (nbig, 3))
    scales = np.exp(log_s).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacity = rng.uniform(0.2, 0.95, (n, 1)).astype(np.float32)
    opacity[: nbig // 2] = 0.99  # force early-termination paths
    colors = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    return means, scales, quats, opacity, colors


def inputs_of(means, scales, quats, opacity, colors):
    return GaussianInputs(
        means3d=jnp.asarray(means), opacities=jnp.asarray(opacity),
        scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
        colors_precomp=jnp.asarray(colors),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tiled_matches_reference_image(seed):
    cam = make_camera()
    scene = random_scene(150, seed=seed)
    bg = jnp.asarray([0.2, 0.4, 0.6], jnp.float32)
    ref = render(cam, inputs_of(*scene), bg, mode="reference")
    til = render(cam, inputs_of(*scene), bg, mode="tiled")
    np.testing.assert_allclose(
        np.asarray(til["render"]), np.asarray(ref["render"]), atol=3e-5
    )
    np.testing.assert_array_equal(
        np.asarray(til["radii"]), np.asarray(ref["radii"])
    )


def test_tiled_matches_reference_gradients():
    cam = make_camera(width=48, height=40)
    means, scales, quats, opacity, colors = random_scene(60, seed=5)
    bg = jnp.zeros(3)
    target = np.random.default_rng(9).uniform(size=(3, 40, 48)).astype(np.float32)

    def loss(mode, m, s, q, o, c):
        out = render(cam, inputs_of(m, s, q, o, c), bg, mode=mode)
        return jnp.mean(jnp.abs(out["render"] - target))

    args = tuple(jnp.asarray(x) for x in (means, scales, quats, opacity, colors))
    g_ref = jax.grad(lambda *a: loss("reference", *a), argnums=tuple(range(5)))(*args)
    g_til = jax.grad(lambda *a: loss("tiled", *a), argnums=tuple(range(5)))(*args)
    for gr, gt in zip(g_ref, g_til):
        np.testing.assert_allclose(
            np.asarray(gt), np.asarray(gr), rtol=2e-3, atol=2e-6
        )


def test_tiled_vspace_tap_gradient_matches():
    cam = make_camera(width=48, height=40)
    means, scales, quats, opacity, colors = random_scene(40, seed=6)
    bg = jnp.zeros(3)
    target = np.random.default_rng(10).uniform(size=(3, 40, 48)).astype(np.float32)

    def loss(mode, tap):
        out = render(
            cam, inputs_of(means, scales, quats, opacity, colors), bg,
            mode=mode, vspace_tap=tap,
        )
        return jnp.mean(jnp.abs(out["render"] - target))

    tap0 = jnp.zeros((40, 3), jnp.float32)
    g_ref = jax.grad(lambda t: loss("reference", t))(tap0)
    g_til = jax.grad(lambda t: loss("tiled", t))(tap0)
    np.testing.assert_allclose(np.asarray(g_til), np.asarray(g_ref), rtol=2e-3, atol=2e-6)


def test_instance_count_and_overflow():
    cam = make_camera()
    means, scales, quats, opacity, colors = random_scene(50, seed=7)
    cov3d = transforms.build_covariance(jnp.asarray(scales), jnp.asarray(quats))
    proj = projection.project_gaussians(
        jnp.asarray(means), cov3d, cam.world_view_transform,
        cam.full_proj_transform, cam.tanfovx, cam.tanfovy,
        cam.image_width, cam.image_height,
    )
    valid = proj["radius"] > 0
    total = int(
        instance_count(proj["mean2d"], proj["radius"], valid, 80, 64)
    )
    assert total > 0

    dirs = jnp.asarray(colors)
    # exact-capacity render == big-capacity render
    img1, ov1 = rasterize_tiled(
        proj["mean2d"], proj["depth"], proj["conic"], dirs,
        jnp.asarray(opacity[:, 0]), proj["radius"], valid,
        jnp.zeros(3), 80, 64, max_instances=-(-total // 256) * 256,
    )
    img2, ov2 = rasterize_tiled(
        proj["mean2d"], proj["depth"], proj["conic"], dirs,
        jnp.asarray(opacity[:, 0]), proj["radius"], valid,
        jnp.zeros(3), 80, 64, max_instances=4 * total,
    )
    assert int(ov1) == 0 and int(ov2) == 0
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-6)

    # undersized capacity reports overflow and still runs
    under = max(64, total // 2 // 64 * 64)
    assert under < total, (under, total)
    img3, ov3 = rasterize_tiled(
        proj["mean2d"], proj["depth"], proj["conic"], dirs,
        jnp.asarray(opacity[:, 0]), proj["radius"], valid,
        jnp.zeros(3), 80, 64, max_instances=under,
    )
    assert int(ov3) == total - under
    assert np.isfinite(np.asarray(img3)).all()


def test_tiled_empty_scene():
    img, ov = rasterize_tiled(
        jnp.zeros((4, 2)), jnp.ones(4), jnp.ones((4, 3)), jnp.ones((4, 3)),
        jnp.ones(4), jnp.zeros(4, jnp.int32), jnp.zeros(4, bool),
        jnp.asarray([0.1, 0.5, 0.9]), 33, 17, max_instances=256,
    )
    assert int(ov) == 0
    np.testing.assert_allclose(
        np.asarray(img),
        np.broadcast_to(np.asarray([0.1, 0.5, 0.9])[:, None, None], (3, 17, 33)),
        rtol=1e-6,
    )


def test_determinism_bit_exact():
    """The CUDA rasterizer's atomics make its backward nondeterministic;
    the JAX design is deterministic by construction — assert it
    (SURVEY.md §5 race-detection note)."""
    cam = make_camera()
    scene = random_scene(100, seed=13)
    bg = jnp.zeros(3)
    target = np.random.default_rng(14).uniform(size=(3, 64, 80)).astype(np.float32)

    def run():
        def loss(m, s, q, o, c):
            out = render(cam, inputs_of(m, s, q, o, c), bg, mode="tiled")
            return jnp.mean(jnp.abs(out["render"] - target)), out["render"]

        (l, img), grads = jax.value_and_grad(
            lambda *a: loss(*a), argnums=(0, 3), has_aux=True
        )(*(jnp.asarray(x) for x in scene))
        return l, img, grads

    l1, img1, g1 = run()
    l2, img2, g2 = run()
    assert float(l1) == float(l2)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kernel_row_bucket_parity_and_overflow():
    """A kernel-row bucket sized from kernel_row_count renders
    bit-identically to the analytic worst case; a too-small bucket
    reports overflow instead of silently truncating."""
    from sgs_tpu.core.projection import project_gaussians
    from sgs_tpu.ops.pallas.flat_raster import KROWS
    from sgs_tpu.render.tiled import kernel_row_count, row_count

    cam = make_camera()
    means, scales, quats, opacity, colors = random_scene(n=150, seed=3)
    g = inputs_of(means, scales, quats, opacity, colors)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

    proj = project_gaussians(
        g.means3d, transforms.build_covariance(g.scales, g.rotations, 1.0),
        cam.world_view_transform, cam.full_proj_transform,
        cam.tanfovx, cam.tanfovy, cam.image_width, cam.image_height,
    )
    valid = proj["radius"] > 0
    rows = int(
        row_count(proj["mean2d"], proj["radius"], valid,
                  cam.image_width, cam.image_height)
    )
    max_rows = max(256, rows + 32)
    max_instances = 4096
    krows = int(
        kernel_row_count(
            proj["mean2d"], proj["conic"], g.opacities[..., 0],
            proj["depth"], proj["radius"], valid,
            cam.image_width, cam.image_height, max_instances, max_rows,
        )
    )
    bucket = -(-(krows + KROWS) // KROWS) * KROWS

    def run(max_kernel_rows):
        return render(
            cam, g, bg, mode="tiled", backend="pallas",
            max_instances=max_instances, max_row_instances=max_rows,
            max_kernel_rows=max_kernel_rows,
        )

    full = run(0)
    bucketed = run(bucket)
    assert int(full["overflow"]) == 0
    assert int(bucketed["overflow"]) == 0
    np.testing.assert_array_equal(
        np.asarray(full["render"]), np.asarray(bucketed["render"])
    )

    # gradients too: same loss gradient through the bucketed path
    def loss(fn_rows, c):
        out = render(
            cam, g.replace(colors_precomp=c), bg, mode="tiled",
            backend="pallas", max_instances=max_instances,
            max_row_instances=max_rows, max_kernel_rows=fn_rows,
        )
        return jnp.sum(out["render"] ** 2)

    c0 = jnp.asarray(colors)
    g_full = jax.grad(lambda c: loss(0, c))(c0)
    g_buck = jax.grad(lambda c: loss(bucket, c))(c0)
    np.testing.assert_allclose(
        np.asarray(g_full), np.asarray(g_buck), rtol=0, atol=0
    )

    # deliberately too-small bucket: overflow must be reported
    tiny = run(KROWS)
    assert int(tiny["overflow"]) > 0
