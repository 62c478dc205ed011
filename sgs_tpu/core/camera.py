"""Camera pytree for jitted rendering/training.

Replaces the reference's torch `Camera`/`MiniCam` classes
(/root/reference/scene/cameras.py:17-70) with a flax.struct dataclass:
matrices and FoV tangents are pytree leaves (traced — so cameras with
different intrinsics share one compiled executable), while image dimensions
are static aux data so XLA shapes stay fixed per-resolution.

Matrices follow the reference's transposed (row-vector) convention:
`world_view_transform` and `full_proj_transform` are applied as
`p_hom @ M`, `camera_center = inv(world_view_transform)[3, :3]`.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from sgs_tpu.core import projection


@struct.dataclass
class Camera:
    # --- traced leaves ---
    world_view_transform: jnp.ndarray  # (4, 4) transposed world->view
    full_proj_transform: jnp.ndarray   # (4, 4) transposed world->clip
    camera_center: jnp.ndarray         # (3,)
    tanfovx: jnp.ndarray               # scalar
    tanfovy: jnp.ndarray               # scalar
    # --- static metadata ---
    image_width: int = struct.field(pytree_node=False)
    image_height: int = struct.field(pytree_node=False)

    @classmethod
    def from_Rt(
        cls,
        R: np.ndarray,
        T: np.ndarray,
        fovx: float,
        fovy: float,
        width: int,
        height: int,
        znear: float = 0.01,
        zfar: float = 100.0,
        trans: Optional[np.ndarray] = None,
        scale: float = 1.0,
    ) -> "Camera":
        """Build from COLMAP-style (R camera-to-world, T world-to-view)."""
        w2v = projection.world_to_view(R, T, trans, scale)  # column-vector form
        proj = projection.perspective_projection(znear, zfar, fovx, fovy)
        view_T = w2v.T
        full_T = (proj @ w2v).T
        center = np.linalg.inv(view_T)[3, :3]
        return cls(
            world_view_transform=jnp.asarray(view_T, dtype=jnp.float32),
            full_proj_transform=jnp.asarray(full_T, dtype=jnp.float32),
            camera_center=jnp.asarray(center, dtype=jnp.float32),
            tanfovx=jnp.float32(math.tan(fovx * 0.5)),
            tanfovy=jnp.float32(math.tan(fovy * 0.5)),
            image_width=int(width),
            image_height=int(height),
        )

    @classmethod
    def from_matrices(
        cls,
        world_view_transform: np.ndarray,
        full_proj_transform: np.ndarray,
        fovx: float,
        fovy: float,
        width: int,
        height: int,
    ) -> "Camera":
        """MiniCam equivalent — pose-only camera from pre-built (transposed)
        matrices, as received from the network GUI protocol."""
        view_T = np.asarray(world_view_transform, dtype=np.float32)
        center = np.linalg.inv(view_T)[3, :3]
        return cls(
            world_view_transform=jnp.asarray(view_T),
            full_proj_transform=jnp.asarray(full_proj_transform, dtype=jnp.float32),
            camera_center=jnp.asarray(center, dtype=jnp.float32),
            tanfovx=jnp.float32(math.tan(fovx * 0.5)),
            tanfovy=jnp.float32(math.tan(fovy * 0.5)),
            image_width=int(width),
            image_height=int(height),
        )
