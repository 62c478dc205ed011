import math

import jax.numpy as jnp
import numpy as np

from sgs_tpu.core import projection, transforms
from sgs_tpu.core.camera import Camera


def make_camera(width=64, height=48, fovx=math.radians(60), z_offset=0.0):
    fovy = projection.focal2fov(projection.fov2focal(fovx, width), height)
    R = np.eye(3)
    T = np.array([0.0, 0.0, z_offset])
    return Camera.from_Rt(R, T, fovx, fovy, width, height)


def isotropic_cov(n, s):
    scales = jnp.full((n, 3), s, jnp.float32)
    quats = jnp.tile(jnp.asarray([[1.0, 0, 0, 0]], jnp.float32), (n, 1))
    return transforms.build_covariance(scales, quats)


def test_center_point_projects_to_image_center():
    cam = make_camera()
    pts = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)
    out = projection.project_gaussians(
        pts, isotropic_cov(1, 0.05), cam.world_view_transform,
        cam.full_proj_transform, cam.tanfovx, cam.tanfovy,
        cam.image_width, cam.image_height,
    )
    # ndc (0,0) -> pixel ((S-1)/2)
    np.testing.assert_allclose(
        np.asarray(out["mean2d"][0]), [(64 - 1) / 2, (48 - 1) / 2], atol=1e-4
    )
    np.testing.assert_allclose(float(out["depth"][0]), 5.0, rtol=1e-6)
    assert bool(out["in_frustum"][0])
    assert int(out["radius"][0]) > 0


def test_offcenter_pinhole_relation():
    """pixel offset from center = focal * x/z (within float tolerance)."""
    cam = make_camera()
    fovx = math.radians(60)
    x, z = 0.7, 4.0
    pts = jnp.asarray([[x, 0.0, z]], jnp.float32)
    out = projection.project_gaussians(
        pts, isotropic_cov(1, 0.05), cam.world_view_transform,
        cam.full_proj_transform, cam.tanfovx, cam.tanfovy,
        cam.image_width, cam.image_height,
    )
    focal_x = projection.fov2focal(fovx, cam.image_width)
    expected_px = (64 - 1) / 2 + focal_x * x / z
    np.testing.assert_allclose(float(out["mean2d"][0, 0]), expected_px, rtol=1e-4)


def test_behind_camera_culled():
    cam = make_camera()
    pts = jnp.asarray([[0.0, 0.0, -3.0], [0.0, 0.0, 0.1]], jnp.float32)
    out = projection.project_gaussians(
        pts, isotropic_cov(2, 0.05), cam.world_view_transform,
        cam.full_proj_transform, cam.tanfovx, cam.tanfovy,
        cam.image_width, cam.image_height,
    )
    assert not bool(out["in_frustum"][0])
    assert not bool(out["in_frustum"][1])  # z=0.1 <= 0.2 near cull
    assert int(out["radius"][0]) == 0 and int(out["radius"][1]) == 0


def test_far_offscreen_point_has_zero_radius():
    cam = make_camera()
    pts = jnp.asarray([[100.0, 0.0, 5.0]], jnp.float32)  # way off screen
    out = projection.project_gaussians(
        pts, isotropic_cov(1, 0.01), cam.world_view_transform,
        cam.full_proj_transform, cam.tanfovx, cam.tanfovy,
        cam.image_width, cam.image_height,
    )
    assert int(out["radius"][0]) == 0


def test_ewa_isotropic_cov2d_and_radius():
    """On-axis isotropic Gaussian: cov2d ~= (focal*s/z)^2 I + 0.3 I."""
    fovx = math.radians(50)
    cam = make_camera(width=128, height=128, fovx=fovx)
    s, z = 0.2, 6.0
    pts = jnp.asarray([[0.0, 0.0, z]], jnp.float32)
    out = projection.project_gaussians(
        pts, isotropic_cov(1, s), cam.world_view_transform,
        cam.full_proj_transform, cam.tanfovx, cam.tanfovy,
        cam.image_width, cam.image_height,
    )
    focal = projection.fov2focal(fovx, cam.image_width)
    expected_var = (focal * s / z) ** 2 + 0.3
    c = np.asarray(out["cov2d"][0])
    np.testing.assert_allclose(c[0], expected_var, rtol=1e-3)
    np.testing.assert_allclose(c[2], expected_var, rtol=1e-3)
    np.testing.assert_allclose(c[1], 0.0, atol=1e-3)
    assert int(out["radius"][0]) == math.ceil(3 * math.sqrt(expected_var))
    # conic is the inverse of cov2d
    np.testing.assert_allclose(
        np.asarray(out["conic"][0, 0]), 1.0 / expected_var, rtol=1e-3
    )


def test_world_view_round_trip_camera_center():
    rng = np.random.default_rng(7)
    # random c2w rotation + translation
    from scipy.spatial.transform import Rotation

    R = Rotation.random(random_state=1).as_matrix()
    T = rng.normal(size=3)
    cam = Camera.from_Rt(R, T, math.radians(70), math.radians(55), 32, 32)
    # camera center must map to the view-space origin
    c = np.asarray(cam.camera_center)
    view = np.asarray(cam.world_view_transform)
    p = np.concatenate([c, [1.0]]) @ view
    np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)
