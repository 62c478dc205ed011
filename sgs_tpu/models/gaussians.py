"""Capacity-padded Gaussian parameter pool — the TPU-native GaussianModel.

The reference mutates parameter tensor sizes every densification step
(/root/reference/scene/gaussian_model.py:268-413), which is incompatible
with XLA's static shapes. Here the six parameter arrays live in a pool of
fixed capacity C with an `alive` mask; densify/prune become masked scatters
into free slots, and capacity growth is a host-side reallocation (one
recompile). Dead slots hold benign values (identity quaternion, tiny scale,
-10 opacity logit) so activations and their gradients never produce NaNs.

Parameterization matches the reference exactly (gaussian_model.py:33-53):
  xyz        (C, 3)      raw positions
  features_dc   (C, 1, 3)   SH DC band
  features_rest (C, K-1, 3) higher SH bands, K = (max_sh_degree+1)^2
  scaling    (C, 3)      log-space, activation exp
  rotation   (C, 4)      wxyz quaternion, activation L2-normalize
  opacity    (C, 1)      logit, activation sigmoid
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from sgs_tpu.core import sh as sh_lib
from sgs_tpu.core import transforms
from sgs_tpu.render.pipeline import GaussianInputs

PARAM_FIELDS = ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity")
# Reference optimizer param-group names (gaussian_model.py:163-170).
FIELD_TO_GROUP = {
    "xyz": "xyz",
    "features_dc": "f_dc",
    "features_rest": "f_rest",
    "scaling": "scaling",
    "rotation": "rotation",
    "opacity": "opacity",
}

DEAD_OPACITY_LOGIT = -10.0
DEAD_LOG_SCALE = -10.0


@struct.dataclass
class GaussianPool:
    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray
    alive: jnp.ndarray  # (C,) bool
    max_sh_degree: int = struct.field(pytree_node=False, default=3)

    # ------------------------------------------------------------------ views
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive)

    def params(self) -> dict:
        return {f: getattr(self, f) for f in PARAM_FIELDS}

    def with_params(self, params: dict) -> "GaussianPool":
        return self.replace(**params)

    # -------------------------------------------------------------- activated
    @property
    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    @property
    def get_rotation(self) -> jnp.ndarray:
        return transforms.normalize(self.rotation, eps=1e-12)

    @property
    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    @property
    def get_features(self) -> jnp.ndarray:
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_covariance(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        return transforms.build_covariance(
            self.get_scaling, self.rotation, scaling_modifier
        )

    def render_inputs(self, active_sh_degree: int) -> GaussianInputs:
        """Bundle activated attributes for the rasterizer."""
        return GaussianInputs(
            means3d=self.xyz,
            opacities=self.get_opacity,
            scales=self.get_scaling,
            rotations=self.get_rotation,
            shs=self.get_features,
            sh_degree=active_sh_degree,
            alive=self.alive,
        )

    # ----------------------------------------------------------- construction
    @classmethod
    def empty(cls, capacity: int, max_sh_degree: int = 3) -> "GaussianPool":
        k = sh_lib.num_sh_coeffs(max_sh_degree)
        return cls(
            xyz=jnp.zeros((capacity, 3), jnp.float32),
            features_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
            features_rest=jnp.zeros((capacity, k - 1, 3), jnp.float32),
            scaling=jnp.full((capacity, 3), DEAD_LOG_SCALE, jnp.float32),
            rotation=jnp.tile(
                jnp.asarray([[1.0, 0.0, 0.0, 0.0]], jnp.float32), (capacity, 1)
            ),
            opacity=jnp.full((capacity, 1), DEAD_OPACITY_LOGIT, jnp.float32),
            alive=jnp.zeros((capacity,), bool),
            max_sh_degree=max_sh_degree,
        )

    @classmethod
    def from_pcd(
        cls,
        points: np.ndarray,
        colors: np.ndarray,
        max_sh_degree: int = 3,
        capacity: Optional[int] = None,
        knn_dist2: Optional[np.ndarray] = None,
    ) -> "GaussianPool":
        """create_from_pcd (gaussian_model.py:134-157): SfM points -> pool.

        Initial isotropic log-scale = 0.5*log(mean sq dist to 3-NN) clamped
        at 1e-7 (the distCUDA2 path, simple-knn); identity rotations;
        opacity = inverse_sigmoid(0.1); DC color = RGB2SH(rgb).
        """
        from sgs_tpu.ops.knn import mean_sq_dist_3nn

        n = points.shape[0]
        capacity = int(capacity or _default_capacity(n))
        if capacity < n:
            raise ValueError(f"capacity {capacity} < initial points {n}")
        pool = cls.empty(capacity, max_sh_degree)

        pts = jnp.asarray(points, jnp.float32)
        if knn_dist2 is None:
            knn_dist2 = mean_sq_dist_3nn(pts)
        dist2 = jnp.maximum(jnp.asarray(knn_dist2, jnp.float32), 1e-7)
        log_scale = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
        dc = sh_lib.rgb_to_sh(jnp.asarray(colors, jnp.float32))[:, None, :]
        opac = transforms.inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))

        idx = jnp.arange(n)
        return pool.replace(
            xyz=pool.xyz.at[idx].set(pts),
            features_dc=pool.features_dc.at[idx].set(dc),
            scaling=pool.scaling.at[idx].set(log_scale),
            opacity=pool.opacity.at[idx].set(opac),
            alive=pool.alive.at[idx].set(True),
        )

    def grown(self, new_capacity: int) -> "GaussianPool":
        """Host-side capacity growth (triggers recompile of jitted steps)."""
        if new_capacity < self.capacity:
            raise ValueError("cannot shrink pool")
        extra = new_capacity - self.capacity
        if extra == 0:
            return self
        tail = GaussianPool.empty(extra, self.max_sh_degree)
        return GaussianPool(
            **{
                f: jnp.concatenate([getattr(self, f), getattr(tail, f)], axis=0)
                for f in PARAM_FIELDS
            },
            alive=jnp.concatenate([self.alive, tail.alive]),
            max_sh_degree=self.max_sh_degree,
        )

    def compact_arrays(self) -> dict:
        """Gather alive rows to the front (host-side, for PLY export).

        Returns numpy arrays of exactly num_alive rows, in slot order.
        """
        alive = np.asarray(self.alive)
        idx = np.nonzero(alive)[0]
        return {f: np.asarray(getattr(self, f))[idx] for f in PARAM_FIELDS}


def _default_capacity(n: int) -> int:
    """Initial capacity: room to densify before the first regrow; round up
    to a lane-friendly multiple of 256."""
    c = max(int(n * 1.5), n + 1024)
    return -(-c // 256) * 256


@struct.dataclass
class DensifyStats:
    """Densification accumulators (gaussian_model.py:54-57,415-417)."""

    xyz_gradient_accum: jnp.ndarray  # (C, 1)
    denom: jnp.ndarray  # (C, 1)
    max_radii2d: jnp.ndarray  # (C,)

    @classmethod
    def zeros(cls, capacity: int) -> "DensifyStats":
        return cls(
            xyz_gradient_accum=jnp.zeros((capacity, 1), jnp.float32),
            denom=jnp.zeros((capacity, 1), jnp.float32),
            max_radii2d=jnp.zeros((capacity,), jnp.float32),
        )

    def update(
        self, vspace_grad: jnp.ndarray, radii: jnp.ndarray, visibility: jnp.ndarray
    ) -> "DensifyStats":
        """add_densification_stats + the train loop's max_radii2D update
        (train.py:129-131): accumulate ||dL/dmean2D_xy|| for visible points."""
        gnorm = jnp.linalg.norm(vspace_grad[:, :2], axis=-1, keepdims=True)
        vis = visibility[:, None]
        return DensifyStats(
            xyz_gradient_accum=self.xyz_gradient_accum + jnp.where(vis, gnorm, 0.0),
            denom=self.denom + vis.astype(jnp.float32),
            max_radii2d=jnp.maximum(
                self.max_radii2d, jnp.where(visibility, radii.astype(jnp.float32), 0.0)
            ),
        )
