"""Quaternion / covariance geometry, pure jnp and fully vmap-able.

Reproduces the parameterization contract of the reference model
(/root/reference/utils/general_utils.py:64-110 and
scene/gaussian_model.py:25-43): quaternions stored (w, x, y, z), scales in
log-space activated by exp, 3D covariance Sigma = (R S)(R S)^T stored as the
6-element upper triangle [xx, xy, xz, yy, yz, zz].

All functions accept arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Geometry matmuls are tiny but precision-critical: TPU's default matmul
# precision is bfloat16, which visibly corrupts covariances. Pin fp32.
_HIGHEST = jax.lax.Precision.HIGHEST


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion (any norm) -> (..., 3, 3) rotation matrix.

    Normalizes internally, like the reference's build_rotation
    (utils/general_utils.py:78-98).
    """
    q = normalize(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack(
        [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - w * z), 2.0 * (x * z + w * y)], -1
    )
    r1 = jnp.stack(
        [2.0 * (x * y + w * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - w * x)], -1
    )
    r2 = jnp.stack(
        [2.0 * (x * z - w * y), 2.0 * (y * z + w * x), 1.0 - 2.0 * (x * x + y * y)], -1
    )
    return jnp.stack([r0, r1, r2], axis=-2)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions, (..., 4) x (..., 4) -> (..., 4).

    Matches the composition used by the latent model
    (/root/reference/scene/latent_gaussian_model.py:13-37).
    """
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def scaling_rotation_factor(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): (..., 3), (..., 4) -> (..., 3, 3).

    The reference's build_scaling_rotation (utils/general_utils.py:100-110).
    """
    rot = quat_to_rotmat(quats)
    return rot * scales[..., None, :]


def covariance_from_scaling_rotation(
    scales: jnp.ndarray, quats: jnp.ndarray, scaling_modifier: float = 1.0
) -> jnp.ndarray:
    """Full 3x3 covariance Sigma = L L^T from activated scales + quaternion."""
    length = scaling_rotation_factor(scaling_modifier * scales, quats)
    return jnp.matmul(length, jnp.swapaxes(length, -1, -2), precision=_HIGHEST)


def strip_symmetric(sym: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) symmetric -> (..., 6) upper triangle [xx,xy,xz,yy,yz,zz].

    Matches strip_lowerdiag (utils/general_utils.py:64-76)."""
    return jnp.stack(
        [
            sym[..., 0, 0],
            sym[..., 0, 1],
            sym[..., 0, 2],
            sym[..., 1, 1],
            sym[..., 1, 2],
            sym[..., 2, 2],
        ],
        axis=-1,
    )


def unstrip_symmetric(six: jnp.ndarray) -> jnp.ndarray:
    """Inverse of strip_symmetric: (..., 6) -> (..., 3, 3)."""
    xx, xy, xz, yy, yz, zz = (six[..., i] for i in range(6))
    r0 = jnp.stack([xx, xy, xz], -1)
    r1 = jnp.stack([xy, yy, yz], -1)
    r2 = jnp.stack([xz, yz, zz], -1)
    return jnp.stack([r0, r1, r2], axis=-2)


def build_covariance(scales, quats, scaling_modifier: float = 1.0) -> jnp.ndarray:
    """Activated (scale, quat) -> stripped 6-vector covariance, the public
    `get_covariance` contract (scene/gaussian_model.py:25-29,127).

    Elementwise structure-of-arrays formulation: batched (N, 3, 3)
    dot_generals at 3-lane width run the MXU at ~2% utilization and
    device-trace at ~3 ms/frame at 100k Gaussians; the same math as
    fused (N,) column arithmetic is bandwidth-noise. Same values as
    strip_symmetric(covariance_from_scaling_rotation(...)) up to f32
    association order."""
    q = normalize(quats)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    s = scaling_modifier * scales
    v0 = s[..., 0] * s[..., 0]
    v1 = s[..., 1] * s[..., 1]
    v2 = s[..., 2] * s[..., 2]
    xx = v0 * r00 * r00 + v1 * r01 * r01 + v2 * r02 * r02
    xy = v0 * r00 * r10 + v1 * r01 * r11 + v2 * r02 * r12
    xz = v0 * r00 * r20 + v1 * r01 * r21 + v2 * r02 * r22
    yy = v0 * r10 * r10 + v1 * r11 * r11 + v2 * r12 * r12
    yz = v0 * r10 * r20 + v1 * r11 * r21 + v2 * r12 * r22
    zz = v0 * r20 * r20 + v1 * r21 * r21 + v2 * r22 * r22
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))
