"""DeepSDF-style autodecoder MLP + NeRF positional embedding (flax).

Re-implements /root/reference/scene/autodecoder.py: configurable hidden
sizes, optional per-layer weight normalization, residual connections after
layer 0 (added pre-ReLU), optional tanh output, optional latent/pos-emb
re-injection, and the sin/cos positional encoding (multires=10 ->
3 + 3*2*10 = 63 dims, ordered [x, sin(f0 x), cos(f0 x), sin(f1 x), ...]).

The MLP is the MXU's favorite workload: (M, D_in) x (D_in, D_out) matmuls
batched over all structures at once.

Linear layers use torch's U(-1/sqrt(fan_in)) init so convergence behavior
tracks the reference.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_embedder(multires: int = 10) -> Tuple[Callable, int]:
    """Returns (embed_fn, out_dim) — NeRF §5.1 positional encoding."""
    freqs = 2.0 ** jnp.linspace(0.0, multires - 1, multires)

    def embed(x: jnp.ndarray) -> jnp.ndarray:
        outs = [x]
        for f in freqs:
            outs.append(jnp.sin(x * f))
            outs.append(jnp.cos(x * f))
        return jnp.concatenate(outs, axis=-1)

    return embed, 3 + 3 * 2 * multires


def _torch_linear_init(scale_by_fan_in: bool = True):
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] if len(shape) == 2 else shape[-1]
        bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, jnp.float32))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class WeightNormDense(nn.Module):
    """Dense layer with weight normalization: W = g * v / ||v||_col."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        v = self.param("v", _torch_linear_init(), (in_dim, self.features))
        g = self.param(
            "g", lambda k, s: jnp.linalg.norm(v, axis=0), (self.features,)
        )
        b = self.param("b", _torch_linear_init(), (self.features,))
        w = v * (g / jnp.maximum(jnp.linalg.norm(v, axis=0), 1e-12))[None, :]
        return jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST) + b


class TorchDense(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", _torch_linear_init(), (x.shape[-1], self.features))
        b = self.param("bias", _torch_linear_init(), (self.features,))
        return jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST) + b


class Decoder(nn.Module):
    """The reference Decoder (autodecoder.py:61-185).

    latent_in re-injects the full input at given layers; norm_layers +
    weight_norm selects weight-normalized linears (the reference applies
    weight norm only when `layer in norm_layers`).
    """

    latent_size: int
    hidden_sizes: Sequence[int]
    output_dim: int
    pos_emb_size: int = 0
    norm_layers: Sequence[int] = tuple(range(8))
    latent_in: Sequence[int] = ()
    weight_norm: bool = True
    use_tanh: bool = False
    residual: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dims = [self.latent_size + self.pos_emb_size] + list(self.hidden_sizes) + [
            self.output_dim
        ]
        num_layers = len(dims)
        inp = x
        for layer in range(num_layers - 1):
            if layer + 1 in self.latent_in:
                out_dim = dims[layer + 1] - dims[0]
            else:
                out_dim = dims[layer + 1]
            residual = x
            if layer in self.latent_in:
                x = jnp.concatenate([x, inp], axis=-1)
            if self.weight_norm and layer in self.norm_layers:
                x = WeightNormDense(out_dim, name=f"lin{layer}")(x)
            else:
                x = TorchDense(out_dim, name=f"lin{layer}")(x)
            if layer == num_layers - 2 and self.use_tanh:
                x = jnp.tanh(x)
            if layer < num_layers - 2:
                if self.residual and layer != 0:
                    x = x + residual
                x = jax.nn.relu(x)
        return x


def decode_latents(
    decoder: Decoder,
    params,
    latents: jnp.ndarray,
    xyz: Optional[jnp.ndarray] = None,
    embed_fn: Optional[Callable] = None,
) -> jnp.ndarray:
    """Decoder.forward: optional positional embedding of the (detached)
    structure means concatenated BEFORE the latents (autodecoder.py:173-185)."""
    if xyz is not None:
        pos = embed_fn(jax.lax.stop_gradient(xyz))
        inp = jnp.concatenate([pos, latents], axis=-1)
    else:
        inp = latents
    return decoder.apply({"params": params}, inp)
