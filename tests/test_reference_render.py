import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgs_tpu.core import projection, transforms
from sgs_tpu.core.camera import Camera
from sgs_tpu.render import GaussianInputs, render
from sgs_tpu.render.reference import rasterize_sorted

from brute_force import brute_force_render


def make_camera(width=40, height=32, fovx=math.radians(60)):
    fovy = projection.focal2fov(projection.fov2focal(fovx, width), height)
    return Camera.from_Rt(np.eye(3), np.zeros(3), fovx, fovy, width, height)


def random_scene(n=40, seed=0, spread=1.0, zmin=2.0, zmax=8.0):
    rng = np.random.default_rng(seed)
    means = np.stack(
        [
            rng.uniform(-spread, spread, n),
            rng.uniform(-spread, spread, n),
            rng.uniform(zmin, zmax, n),
        ],
        axis=-1,
    ).astype(np.float32)
    scales = np.exp(rng.uniform(-3.0, -1.0, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacity = rng.uniform(0.2, 0.95, (n, 1)).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    return means, scales, quats, opacity, colors


def project_scene(cam, means, scales, quats):
    cov3d = transforms.build_covariance(jnp.asarray(scales), jnp.asarray(quats))
    return projection.project_gaussians(
        jnp.asarray(means), cov3d, cam.world_view_transform,
        cam.full_proj_transform, cam.tanfovx, cam.tanfovy,
        cam.image_width, cam.image_height,
    )


@pytest.mark.parametrize("chunk_size", [4, 16, 256])
def test_matches_brute_force(chunk_size):
    """Vectorized chunked-scan compositing == independent per-pixel loop,
    across chunk sizes (exercises the in-chunk termination latch)."""
    cam = make_camera()
    means, scales, quats, opacity, colors = random_scene(60, seed=1)
    # Push some opacities to 0.99 to force early termination paths.
    opacity[:10] = 0.99
    proj = project_scene(cam, means, scales, quats)
    valid = np.asarray(proj["radius"]) > 0
    assert valid.sum() > 10
    bg = np.array([0.1, 0.2, 0.3], np.float32)

    img = rasterize_sorted(
        proj["mean2d"], proj["depth"], proj["conic"], jnp.asarray(colors),
        jnp.asarray(opacity[:, 0]), jnp.asarray(valid), jnp.asarray(bg),
        cam.image_width, cam.image_height, radius=proj["radius"],
        chunk_size=chunk_size, pixel_block=128,
    )
    expected = brute_force_render(
        np.asarray(proj["mean2d"]), np.asarray(proj["depth"]),
        np.asarray(proj["conic"]), colors, opacity[:, 0], valid, bg,
        cam.image_width, cam.image_height, radius=np.asarray(proj["radius"]),
    )
    np.testing.assert_allclose(np.asarray(img), expected, atol=2e-5)


def test_single_gaussian_analytic():
    """One isotropic Gaussian at the image center: the center pixel value is
    analytically bg*(1-alpha) + alpha*color."""
    cam = make_camera(width=33, height=33)
    s, z, op = 0.1, 4.0, 0.8
    focal = projection.fov2focal(math.radians(60), 33)
    means = np.array([[0.0, 0.0, z]], np.float32)
    scales = np.full((1, 3), s, np.float32)
    quats = np.array([[1, 0, 0, 0]], np.float32)
    proj = project_scene(cam, means, scales, quats)
    color = np.array([[1.0, 0.5, 0.25]], np.float32)
    bg = np.zeros(3, np.float32)
    img = np.asarray(
        rasterize_sorted(
            proj["mean2d"], proj["depth"], proj["conic"], jnp.asarray(color),
            jnp.asarray([op]), jnp.asarray([True]), jnp.asarray(bg), 33, 33,
        )
    )
    # Center pixel (16,16) coincides with mean2d -> power=0 -> alpha=op.
    np.testing.assert_allclose(img[:, 16, 16], op * color[0], rtol=1e-5)
    # Pixel one to the right: alpha = op * exp(-0.5 / var)
    var = (focal * s / z) ** 2 + 0.3
    a = op * math.exp(-0.5 / var)
    np.testing.assert_allclose(img[:, 16, 17], a * color[0], rtol=1e-4)


def test_empty_scene_renders_background():
    cam = make_camera()
    bg = jnp.asarray([0.3, 0.6, 0.9], jnp.float32)
    img = rasterize_sorted(
        jnp.zeros((4, 2)), jnp.ones(4), jnp.ones((4, 3)), jnp.ones((4, 3)),
        jnp.ones(4), jnp.zeros(4, bool), bg, 8, 8,
    )
    np.testing.assert_allclose(
        np.asarray(img), np.broadcast_to(np.asarray(bg)[:, None, None], (3, 8, 8)),
        rtol=1e-6,
    )


def test_full_render_pipeline_and_contract():
    cam = make_camera()
    means, scales, quats, opacity, colors = random_scene(30, seed=7)
    from sgs_tpu.core import sh as sh_lib

    shs = jnp.asarray(sh_lib.rgb_to_sh(colors))[:, None, :]  # (N,1,3) degree 0
    out = render(
        cam,
        GaussianInputs(
            means3d=jnp.asarray(means), opacities=jnp.asarray(opacity),
            scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
            shs=shs, sh_degree=0,
        ),
        bg_color=jnp.zeros(3),
    )
    assert out["render"].shape == (3, 32, 40)
    assert out["radii"].dtype == jnp.int32
    assert bool(jnp.any(out["visibility_filter"]))
    np.testing.assert_array_equal(
        np.asarray(out["visibility_filter"]), np.asarray(out["radii"]) > 0
    )
    # SH degree-0 colors equal the clamped DC conversion; rendering with
    # colors_precomp must give the identical image.
    out2 = render(
        cam,
        GaussianInputs(
            means3d=jnp.asarray(means), opacities=jnp.asarray(opacity),
            scales=jnp.asarray(scales), rotations=jnp.asarray(quats),
            colors_precomp=jnp.asarray(colors),
        ),
        bg_color=jnp.zeros(3),
    )
    np.testing.assert_allclose(
        np.asarray(out["render"]), np.asarray(out2["render"]), atol=1e-5
    )


def test_gradcheck_finite_difference():
    """End-to-end gradient of a scalar loss vs central finite differences in
    float64 (tiny eps keeps FD away from the compositing discontinuities),
    over parameters of every kind (BASELINE config 1)."""
    with jax.enable_x64():
        cam = make_camera(width=24, height=20)
        means, scales, quats, opacity, colors = random_scene(12, seed=11)
        target = np.random.default_rng(12).uniform(size=(3, 20, 24))
        bg = jnp.asarray([0.5, 0.5, 0.5], jnp.float64)

        def loss_fn(means_, scales_, quats_, opacity_, colors_):
            out = render(
                cam,
                GaussianInputs(
                    means3d=means_, opacities=opacity_, scales=jnp.exp(scales_),
                    rotations=quats_, colors_precomp=colors_,
                ),
                bg_color=bg,
            )
            return jnp.mean(jnp.abs(out["render"] - target))

        args = [
            jnp.asarray(means, jnp.float64),
            jnp.asarray(np.log(scales), jnp.float64),
            jnp.asarray(quats, jnp.float64),
            jnp.asarray(opacity, jnp.float64),
            jnp.asarray(colors, jnp.float64),
        ]
        grads = jax.grad(loss_fn, argnums=tuple(range(5)))(*args)

        eps = 1e-6
        checked = 0
        for ai, g in enumerate(grads):
            g = np.asarray(g)
            flat = np.abs(g).ravel()
            # check the 3 largest-magnitude entries of each arg
            for idx in np.argsort(flat)[-3:]:
                multi = np.unravel_index(idx, g.shape)

                def perturbed(delta):
                    new = [jnp.asarray(a) for a in args]
                    new[ai] = new[ai].at[multi].add(delta)
                    return float(loss_fn(*new))

                fd = (perturbed(eps) - perturbed(-eps)) / (2 * eps)
                if abs(fd) < 1e-9 and abs(g[multi]) < 1e-9:
                    continue
                np.testing.assert_allclose(g[multi], fd, rtol=1e-4, atol=1e-8)
                checked += 1
        assert checked >= 8


def test_viewspace_tap_gradient_units():
    """dL/d(tap) must equal the pixel-space gradient scaled by 0.5*[W,H]
    (the CUDA dL/dmean2D NDC convention the densifier thresholds against)."""
    with jax.enable_x64():
        cam = make_camera(width=30, height=26)
        means, scales, quats, opacity, colors = random_scene(8, seed=21)
        bg = jnp.zeros(3, jnp.float64)
        target = np.random.default_rng(22).uniform(size=(3, 26, 30))

        def loss_with_tap(tap):
            out = render(
                cam,
                GaussianInputs(
                    means3d=jnp.asarray(means, jnp.float64),
                    opacities=jnp.asarray(opacity, jnp.float64),
                    scales=jnp.asarray(scales, jnp.float64),
                    rotations=jnp.asarray(quats, jnp.float64),
                    colors_precomp=jnp.asarray(colors, jnp.float64),
                ),
                bg_color=bg, vspace_tap=tap,
            )
            return jnp.mean(jnp.abs(out["render"] - target))

        tap0 = jnp.zeros((8, 3), jnp.float64)
        g_tap = np.asarray(jax.grad(loss_with_tap)(tap0))
        assert np.all(g_tap[:, 2] == 0.0)  # z column unused

        # finite-difference in NDC units on one gaussian
        i = int(np.argmax(np.abs(g_tap[:, 0])))
        eps_ndc = 1e-6
        fd = (
            float(loss_with_tap(tap0.at[i, 0].add(eps_ndc)))
            - float(loss_with_tap(tap0.at[i, 0].add(-eps_ndc)))
        ) / (2 * eps_ndc)
        np.testing.assert_allclose(g_tap[i, 0], fd, rtol=1e-4, atol=1e-8)

        # and the NDC-vs-pixel scaling: a tap of delta in NDC must move the
        # center by delta * 0.5 * W pixels.
        out0 = render(
            cam,
            GaussianInputs(
                means3d=jnp.asarray(means, jnp.float64),
                opacities=jnp.asarray(opacity, jnp.float64),
                scales=jnp.asarray(scales, jnp.float64),
                rotations=jnp.asarray(quats, jnp.float64),
                colors_precomp=jnp.asarray(colors, jnp.float64),
            ),
            bg_color=bg, vspace_tap=tap0.at[0, 0].add(0.1),
        )
        assert out0["render"].shape == (3, 26, 30)
