"""Latent / structured Gaussian model — the 'structured' capability.

Re-designs /root/reference/scene/latent_gaussian_model.py for JAX: instead
of a decoder mutating inherited `_xyz/...` fields each iteration, the model
is an immutable pytree of per-structure parameters + decoder weights, and
`decode()` is a pure function producing the flat per-Gaussian raw
parameters (same fields as GaussianPool) which feed the standard renderer.

Semantics preserved exactly:
  - per-structure params: means (M,3), opacity logits (M,1), log-scales
    (M,3), quaternions (M,4), latents (M,L=32);
  - decoder MLP maps latent (+ optional positional embedding of the
    structure mean) -> K x D raw Gaussian params, D = 11 + 3(deg+1)^2;
  - composition: xyz = offset + mean; opacity/scale = offset + structure
    value (pre-activation); rotation = standardize(normalize(q_struct) *
    normalize(q_offset)); SH features are sliced from the tail;
  - create_from_pcd init: structures like Gaussians (3-NN scales, identity
    rotations, sigmoid^-1(0.1) opacity) and latents = randn with dims 0:7
    zeroed, 7:11 = identity quaternion, 11:14 = RGB2SH(color);
  - additive latent noise supported for the sampling/debug experiments.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from sgs_tpu.core import sh as sh_lib
from sgs_tpu.core import transforms
from sgs_tpu.models.autodecoder import Decoder, decode_latents, get_embedder
from sgs_tpu.render.pipeline import GaussianInputs


def standardize_quaternion(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(q[..., 0:1] < 0, -q, q)


def quaternion_normalize_then_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    ab = transforms.quat_multiply(
        transforms.normalize(a, eps=1e-12), transforms.normalize(b, eps=1e-12)
    )
    return standardize_quaternion(ab)


@struct.dataclass
class LatentGaussianModel:
    structure_means: jnp.ndarray  # (M, 3)
    structure_opacities: jnp.ndarray  # (M, 1) logits
    structure_scales: jnp.ndarray  # (M, 3) log-space
    structure_rotations: jnp.ndarray  # (M, 4)
    structure_latents: jnp.ndarray  # (M, L)
    decoder_params: dict
    # static config
    sh_degree: int = struct.field(pytree_node=False, default=0)
    latent_size: int = struct.field(pytree_node=False, default=32)
    hidden_size: int = struct.field(pytree_node=False, default=32)
    gaussians_per_structure: int = struct.field(pytree_node=False, default=8)
    use_positional_embedding: bool = struct.field(pytree_node=False, default=False)
    positional_embedding_multires: int = struct.field(pytree_node=False, default=10)

    @property
    def num_structures(self) -> int:
        return self.structure_means.shape[0]

    @property
    def num_gaussians(self) -> int:
        return self.num_structures * self.gaussians_per_structure

    @property
    def gaussian_parameters_size(self) -> int:
        return 11 + 3 * (self.sh_degree + 1) ** 2

    def make_decoder(self) -> Decoder:
        pos_size = 0
        if self.use_positional_embedding:
            _, pos_size = get_embedder(self.positional_embedding_multires)
        return Decoder(
            latent_size=self.latent_size,
            hidden_sizes=[self.hidden_size] * 2,
            output_dim=self.gaussian_parameters_size * self.gaussians_per_structure,
            pos_emb_size=pos_size,
            norm_layers=(),  # the reference passes norm_layers=[] here
        )

    # ------------------------------------------------------------- decode
    def decode(self, latent_noise: Optional[jnp.ndarray] = None) -> dict:
        """Latents -> flat raw Gaussian parameter dict (pool field layout)."""
        m, k, d = self.num_structures, self.gaussians_per_structure, self.gaussian_parameters_size
        latents = self.structure_latents
        if latent_noise is not None:
            latents = latents + jax.lax.stop_gradient(latent_noise)
        decoder = self.make_decoder()
        if self.use_positional_embedding:
            embed_fn, _ = get_embedder(self.positional_embedding_multires)
            out = decode_latents(
                decoder, self.decoder_params, latents,
                xyz=self.structure_means, embed_fn=embed_fn,
            )
        else:
            out = decode_latents(decoder, self.decoder_params, latents)
        p = out.reshape(m, k, d)

        xyz = (p[:, :, 0:3] + self.structure_means[:, None, :]).reshape(m * k, 3)
        opacity = (p[:, :, 3:4] + self.structure_opacities[:, None, :]).reshape(m * k, 1)
        scaling = (p[:, :, 4:7] + self.structure_scales[:, None, :]).reshape(m * k, 3)
        rotation = quaternion_normalize_then_multiply(
            self.structure_rotations[:, None, :], p[:, :, 7:11]
        ).reshape(m * k, 4)
        features_dc = p[:, :, 11:14].reshape(m * k, 1, 3)
        n_rest = (self.sh_degree + 1) ** 2 - 1
        features_rest = p[:, :, 14:].reshape(m * k, n_rest, 3)
        return {
            "xyz": xyz,
            "opacity": opacity,
            "scaling": scaling,
            "rotation": rotation,
            "features_dc": features_dc,
            "features_rest": features_rest,
        }

    def render_inputs(
        self, active_sh_degree: int, latent_noise: Optional[jnp.ndarray] = None
    ) -> GaussianInputs:
        raw = self.decode(latent_noise)
        return GaussianInputs(
            means3d=raw["xyz"],
            opacities=jax.nn.sigmoid(raw["opacity"]),
            scales=jnp.exp(raw["scaling"]),
            # decode() already emits unit quaternions; renderer re-normalizes
            rotations=raw["rotation"],
            shs=jnp.concatenate([raw["features_dc"], raw["features_rest"]], axis=1),
            sh_degree=active_sh_degree,
            alive=jnp.ones((raw["xyz"].shape[0],), bool),
        )

    # ------------------------------------------------------------- builders
    @classmethod
    def create(
        cls,
        rng: jax.Array,
        structure_means_init: np.ndarray,
        sh_degree: int = 0,
        latent_size: int = 32,
        hidden_size: int = 32,
        gaussians_per_structure: int = 8,
        use_positional_embedding: bool = False,
        positional_embedding_multires: int = 10,
    ) -> "LatentGaussianModel":
        """Constructor-path init (random structures; latent_gaussian_model
        __init__:66-111)."""
        m = structure_means_init.shape[0]
        k_lat, k_rot, k_dec = jax.random.split(rng, 3)
        model = cls(
            structure_means=jnp.asarray(structure_means_init, jnp.float32),
            structure_opacities=transforms.inverse_sigmoid(
                0.1 * jnp.ones((m, 1), jnp.float32)
            ),
            structure_scales=jnp.ones((m, 3), jnp.float32),
            structure_rotations=jax.random.normal(k_rot, (m, 4), jnp.float32),
            structure_latents=jax.random.normal(k_lat, (m, latent_size), jnp.float32),
            decoder_params={},
            sh_degree=sh_degree,
            latent_size=latent_size,
            hidden_size=hidden_size,
            gaussians_per_structure=gaussians_per_structure,
            use_positional_embedding=use_positional_embedding,
            positional_embedding_multires=positional_embedding_multires,
        )
        return model.replace(decoder_params=model._init_decoder(k_dec))

    def _init_decoder(self, rng: jax.Array) -> dict:
        decoder = self.make_decoder()
        pos_size = decoder.pos_emb_size
        dummy = jnp.zeros((1, self.latent_size + pos_size), jnp.float32)
        return decoder.init(rng, dummy)["params"]

    def create_from_pcd(
        self, rng: jax.Array, points: np.ndarray, colors: np.ndarray,
        init_scale_clip: float = 4.0,
    ) -> "LatentGaussianModel":
        """Scene-init path (latent_gaussian_model.py:208-239): structures at
        the SfM points, latents seeded with zeros/identity/color.

        init_scale_clip caps each structure's init scale at clip x the
        MEDIAN 3-NN distance (0 disables -> exact reference init). On a
        sparse/downsampled cloud the raw 3-NN scales give outlier points
        enormous splats: the round-2 LGM run opened with a 4.2M-instance
        footprint for 16k decoded Gaussians and trained at 0.43 it/s —
        the fat-splat init, not the model, set the instance bucket for
        the whole run. The clip is init-only; optimization is free to
        regrow scales (and the overflow-regrow path re-buckets if it
        does)."""
        from sgs_tpu.ops.knn import mean_sq_dist_3nn

        m = points.shape[0]
        pts = jnp.asarray(points, jnp.float32)
        dist2 = jnp.maximum(mean_sq_dist_3nn(pts), 1e-7)
        dist = jnp.sqrt(dist2)
        if init_scale_clip > 0:
            dist = jnp.minimum(dist, init_scale_clip * jnp.median(dist))
        log_scale = jnp.log(dist)[:, None].repeat(3, axis=1)
        rots = jnp.zeros((m, 4), jnp.float32).at[:, 0].set(1.0)
        opac = transforms.inverse_sigmoid(0.1 * jnp.ones((m, 1), jnp.float32))
        fused_color = sh_lib.rgb_to_sh(jnp.asarray(colors, jnp.float32))

        latents = jax.random.normal(rng, (m, self.latent_size), jnp.float32)
        latents = latents.at[:, 0:7].set(0.0)
        latents = latents.at[:, 7:11].set(rots)
        latents = latents.at[:, 11:14].set(fused_color)
        return self.replace(
            structure_means=pts,
            structure_opacities=opac,
            structure_scales=log_scale,
            structure_rotations=rots,
            structure_latents=latents,
        )

    # ------------------------------------------------------------- params
    def trainable_params(self) -> dict:
        return {
            "structure_means": self.structure_means,
            "structure_opacities": self.structure_opacities,
            "structure_scales": self.structure_scales,
            "structure_rotations": self.structure_rotations,
            "structure_latents": self.structure_latents,
            "decoder_params": self.decoder_params,
        }

    def with_params(self, params: dict) -> "LatentGaussianModel":
        return self.replace(**params)
