"""Camera matrices and the per-Gaussian projection (EWA splatting) math.

Host-side matrix builders mirror the reference's conventions
(/root/reference/utils/graphics_utils.py:30-76, scene/cameras.py:51-57):
matrices are stored TRANSPOSED (row-vector convention), i.e. points
transform as `p_hom @ M`.

The per-Gaussian projection reproduces the CUDA preprocess stage of
diff-gaussian-rasterization (see SURVEY.md §2.9 step 1): frustum cull at
view z <= 0.2, EWA local-affine 2D covariance with FoV clamping and a
0.3-pixel low-pass on the diagonal, conic inversion, 3-sigma integer
radius, and NDC -> pixel mapping ((v+1)*S - 1)/2.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# CUDA auxiliary.h constants (public 3DGS rasterizer design).
TILE = 16
NEAR_CULL_Z = 0.2
COV2D_DILATION = 0.3
FOV_CLAMP = 1.3
ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
TRANSMITTANCE_EPS = 1e-4


def world_to_view(R: np.ndarray, t: np.ndarray, translate=None, scale: float = 1.0) -> np.ndarray:
    """4x4 world->view matrix (column-vector form, NOT transposed).

    R is the camera-to-world rotation as stored by the loaders (the
    reference keeps `R` c2w and transposes inside getWorld2View2,
    utils/graphics_utils.py:38-48); t is the world->view translation.
    `translate`/`scale` re-center and re-scale the scene about the camera
    centers (used by the NeRF++-style normalization).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        C2W = np.linalg.inv(Rt)
        C2W[:3, 3] = (C2W[:3, 3] + translate) * scale
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def perspective_projection(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """4x4 perspective matrix (column-vector form), COLMAP z-forward.

    Matches getProjectionMatrix (utils/graphics_utils.py:51-71): maps view z
    to [0, zfar/(zfar-znear)] scaled by w = z.
    """
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def transform_points_hom(points: jnp.ndarray, matrix_T: jnp.ndarray) -> jnp.ndarray:
    """(N,3) points through a TRANSPOSED 4x4 (row-vector convention) -> (N,4).

    One (N,4)x(4,4) matmul — batched and MXU-friendly.
    """
    ones = jnp.ones_like(points[..., :1])
    return jnp.matmul(
        jnp.concatenate([points, ones], axis=-1),
        matrix_T,
        precision=jax.lax.Precision.HIGHEST,
    )


def ndc_to_pixel(ndc: jnp.ndarray, size) -> jnp.ndarray:
    """CUDA ndc2Pix: ((v + 1) * S - 1) * 0.5 per axis. size = (W, H)."""
    size = jnp.asarray(size, dtype=ndc.dtype)
    return ((ndc + 1.0) * size - 1.0) * 0.5


def project_gaussians(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    viewmatrix_T: jnp.ndarray,
    projmatrix_T: jnp.ndarray,
    tanfovx: float,
    tanfovy: float,
    width: int,
    height: int,
):
    """The CUDA preprocess geometry stage, batched over all Gaussians.

    Args:
      means3d: (N, 3) world positions.
      cov3d: (N, 6) stripped 3D covariance (from transforms.build_covariance).
      viewmatrix_T / projmatrix_T: transposed world->view and full
        world->clip matrices (camera convention above); projmatrix_T is the
        PRE-MULTIPLIED view @ proj like the reference's full_proj_transform.
      tanfovx/tanfovy: tangents of half FoV.
      width/height: static ints, output resolution.

    Returns dict with:
      mean2d: (N, 2) pixel-space centers.
      depth: (N,) view-space z.
      conic: (N, 3) inverse 2D covariance [a, b, c] for ax^2 + 2bxy + cy^2.
      radius: (N,) int32 screen radius (0 = culled).
      in_frustum: (N,) bool.
      cov2d: (N, 3) the dilated 2D covariance (for debugging/tests).
    """
    # dtype-polymorphic: float32 in production, float64 for CPU gradchecks.
    f32 = jnp.promote_types(means3d.dtype, jnp.float32)
    means3d = means3d.astype(f32)
    p_view = transform_points_hom(means3d, viewmatrix_T.astype(f32))
    depth = p_view[..., 2]
    in_frustum = depth > NEAR_CULL_Z

    p_hom = transform_points_hom(means3d, projmatrix_T.astype(f32))
    p_w = 1.0 / (p_hom[..., 3] + 1e-7)
    p_proj = p_hom[..., :3] * p_w[..., None]
    mean2d = ndc_to_pixel(p_proj[..., :2], (width, height))

    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)

    # EWA: clamp the view-space direction to 1.3x the frustum before the
    # Jacobian (CUDA computeCov2D).
    tz = depth
    safe_tz = jnp.where(jnp.abs(tz) < 1e-8, 1e-8, tz)
    limx, limy = FOV_CLAMP * tanfovx, FOV_CLAMP * tanfovy
    tx = jnp.clip(p_view[..., 0] / safe_tz, -limx, limx) * tz
    ty = jnp.clip(p_view[..., 1] / safe_tz, -limy, limy) * tz

    # J rows (only the 2 used): [fx/tz, 0, -fx tx/tz^2], [0, fy/tz, -fy ty/tz^2]
    inv_tz = 1.0 / safe_tz
    inv_tz2 = inv_tz * inv_tz
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz2

    # Rows of the view rotation (world->view): for row-vector storage the
    # rotation is viewmatrix_T[:3, :3] transposed back.
    W3 = viewmatrix_T[:3, :3].astype(f32).T  # (3,3) world->view rotation, rows

    # M = J @ W3 restricted to its two used rows (each (N, 3)).
    m0 = j00[..., None] * W3[0] + j02[..., None] * W3[2]
    m1 = j11[..., None] * W3[1] + j12[..., None] * W3[2]

    sigma = _unstrip(cov3d.astype(f32))  # (N, 3, 3)
    # cov2d = M Sigma M^T (2x2, symmetric: keep [xx, xy, yy]).
    hi = jax.lax.Precision.HIGHEST
    s_m0 = jnp.einsum("nij,nj->ni", sigma, m0, precision=hi)
    s_m1 = jnp.einsum("nij,nj->ni", sigma, m1, precision=hi)
    c_xx = jnp.sum(m0 * s_m0, axis=-1) + COV2D_DILATION
    c_xy = jnp.sum(m0 * s_m1, axis=-1)
    c_yy = jnp.sum(m1 * s_m1, axis=-1) + COV2D_DILATION

    det = c_xx * c_yy - c_xy * c_xy
    det_valid = det != 0.0
    safe_det = jnp.where(det_valid, det, 1.0)
    inv_det = 1.0 / safe_det
    conic = jnp.stack([c_yy * inv_det, -c_xy * inv_det, c_xx * inv_det], axis=-1)

    mid = 0.5 * (c_xx + c_yy)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))

    # CUDA getRect cull: a Gaussian overlapping zero on-screen 16x16 tiles
    # keeps radius 0 and is excluded from visibility_filter.
    tiles_x = (width + TILE - 1) // TILE
    tiles_y = (height + TILE - 1) // TILE
    rect_min_x = jnp.clip(((mean2d[..., 0] - radius_f) / TILE).astype(jnp.int32), 0, tiles_x)
    rect_max_x = jnp.clip(
        ((mean2d[..., 0] + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, tiles_x
    )
    rect_min_y = jnp.clip(((mean2d[..., 1] - radius_f) / TILE).astype(jnp.int32), 0, tiles_y)
    rect_max_y = jnp.clip(
        ((mean2d[..., 1] + radius_f + TILE - 1) / TILE).astype(jnp.int32), 0, tiles_y
    )
    nonempty_rect = (rect_max_x > rect_min_x) & (rect_max_y > rect_min_y)

    visible = in_frustum & det_valid & nonempty_rect
    radius = jnp.where(visible, radius_f, 0.0).astype(jnp.int32)

    return {
        "mean2d": mean2d,
        "depth": depth,
        "conic": conic,
        "radius": radius,
        "in_frustum": in_frustum,
        "cov2d": jnp.stack([c_xx, c_xy, c_yy], axis=-1),
    }


def _unstrip(six: jnp.ndarray) -> jnp.ndarray:
    xx, xy, xz, yy, yz, zz = (six[..., i] for i in range(6))
    r0 = jnp.stack([xx, xy, xz], -1)
    r1 = jnp.stack([xy, yy, yz], -1)
    r2 = jnp.stack([xz, yz, zz], -1)
    return jnp.stack([r0, r1, r2], axis=-2)
