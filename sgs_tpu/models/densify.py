"""Adaptive density control on the capacity-padded pool.

Reproduces the reference's densify_and_clone / densify_and_split /
densify_and_prune / reset_opacity semantics
(/root/reference/scene/gaussian_model.py:220-223,359-413) without dynamic
shapes: newcomers are scattered into free slots (ranked via cumsum), pruned
slots are reset to benign defaults and freed, and Adam moments of allocated
slots are zeroed — the static-shape equivalent of the reference's optimizer
state surgery (gaussian_model.py:268-337).

Semantics notes (all matching the reference):
  - clone condition: grad >= thresh AND max(scale) <= percent_dense*extent;
    the clone is an exact parameter copy.
  - split condition: grad >= thresh AND max(scale) > percent_dense*extent;
    N=2 children sampled from N(0, diag(scale^2)) rotated by the parent,
    child log-scale = log(scale / (0.8 * N)); the parent is pruned.
    Clones never split in the same round (reference pads their grads to 0).
  - prune: opacity < min_opacity, plus (when max_screen_size is enabled)
    max_radii2D > max_screen_size or world scale > 0.1 * extent. Applied to
    newly created children as well (children inherit parent opacity; their
    max_radii2D is 0).
  - all densification stats reset to zero afterwards.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from sgs_tpu.core import transforms
from sgs_tpu.models.gaussians import (
    DEAD_LOG_SCALE,
    DEAD_OPACITY_LOGIT,
    DensifyStats,
    GaussianPool,
    PARAM_FIELDS,
)
from sgs_tpu.train.optim import AdamState

SPLIT_SCALE_DIV = 0.8
PRUNE_WS_FACTOR = 0.1


def _benign_row_defaults(pool: GaussianPool) -> dict:
    k = pool.features_rest.shape[1]
    return {
        "xyz": jnp.zeros((3,), jnp.float32),
        "features_dc": jnp.zeros((1, 3), jnp.float32),
        "features_rest": jnp.zeros((k, 3), jnp.float32),
        "scaling": jnp.full((3,), DEAD_LOG_SCALE, jnp.float32),
        "rotation": jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32),
        "opacity": jnp.full((1,), DEAD_OPACITY_LOGIT, jnp.float32),
    }


@partial(
    jax.jit,
    static_argnames=("n_split", "use_screen_size_prune"),
)
def densify_and_prune(
    pool: GaussianPool,
    adam: AdamState,
    stats: DensifyStats,
    rng: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,  # 0.0 disables the screen/world-size prune terms
    percent_dense: float,
    n_split: int = 2,
    use_screen_size_prune: bool = False,
) -> Tuple[GaussianPool, AdamState, DensifyStats, dict]:
    """use_screen_size_prune=False replicates the reference literally: its
    densification_postfix zeroes max_radii2D before densify_and_prune's
    prune test runs (gaussian_model.py:356-357,405-410), so the
    `max_radii2D > max_screen_size` term never fires upstream. True enables
    the paper-intended screen-size pruning."""
    C = pool.capacity
    alive = pool.alive

    grads = stats.xyz_gradient_accum[:, 0] / stats.denom[:, 0]
    grads = jnp.nan_to_num(grads, nan=0.0)

    scales = pool.get_scaling
    max_scale = jnp.max(scales, axis=-1)
    over_thresh = alive & (grads >= max_grad)
    clone_mask = over_thresh & (max_scale <= percent_dense * extent)
    split_mask = over_thresh & (max_scale > percent_dense * extent)

    # ---- children definitions -------------------------------------------
    # Pass A: clone child (exact copy) OR split child #0; pass B..: split
    # children #1..n_split-1. Split children share the sampling formula.
    rot = transforms.quat_to_rotmat(pool.rotation)  # (C, 3, 3)

    def split_child_params(key):
        noise = jax.random.normal(key, (C, 3), jnp.float32) * scales
        offset = jnp.einsum(
            "cij,cj->ci", rot, noise, precision=jax.lax.Precision.HIGHEST
        )
        child = {f: getattr(pool, f) for f in PARAM_FIELDS}
        child["xyz"] = pool.xyz + offset
        child["scaling"] = jnp.log(scales / (SPLIT_SCALE_DIV * n_split))
        return child

    keys = jax.random.split(rng, n_split)
    passes = []  # list of (child_params dict, valid_mask)
    clone_child = {f: getattr(pool, f) for f in PARAM_FIELDS}
    split0 = split_child_params(keys[0])
    passA = {
        f: jnp.where(
            _bmask(clone_mask, clone_child[f]), clone_child[f], split0[f]
        )
        for f in PARAM_FIELDS
    }
    passes.append((passA, clone_mask | split_mask))
    for j in range(1, n_split):
        passes.append((split_child_params(keys[j]), split_mask))

    # ---- prune test (existing slots + children) -------------------------
    opac = pool.get_opacity[:, 0]
    size_on = max_screen_size > 0.0
    base_prune = opac < min_opacity
    big_ws = max_scale > PRUNE_WS_FACTOR * extent
    size_terms = size_on & big_ws
    if use_screen_size_prune:
        size_terms = size_terms | (size_on & (stats.max_radii2d > max_screen_size))
    existing_prune = alive & (base_prune | size_terms)
    existing_prune = existing_prune | split_mask  # split parents die

    def child_prune(child_params, valid):
        c_op = jax.nn.sigmoid(child_params["opacity"][:, 0])
        c_ms = jnp.max(jnp.exp(child_params["scaling"]), axis=-1)
        p = (c_op < min_opacity) | (size_on & (c_ms > PRUNE_WS_FACTOR * extent))
        return valid & ~p

    passes = [(cp, child_prune(cp, v)) for cp, v in passes]

    # ---- free existing pruned slots, reset to benign defaults -----------
    new_alive = alive & ~existing_prune
    defaults = _benign_row_defaults(pool)
    params = {}
    for f in PARAM_FIELDS:
        x = getattr(pool, f)
        m = existing_prune.reshape((C,) + (1,) * (x.ndim - 1))
        params[f] = jnp.where(m, defaults[f][None], x)

    # ---- allocate free slots to surviving children ----------------------
    free = ~new_alive
    # free_slots[r] = index of the (r+1)-th free slot; C = overflow sentinel
    free_slots = jnp.nonzero(free, size=C, fill_value=C)[0]
    num_free = jnp.sum(free)

    offset = jnp.zeros((), jnp.int32)
    newcomer = jnp.zeros((C,), bool)
    n_alloc = jnp.zeros((), jnp.int32)
    for child_params, valid in passes:
        rank = jnp.cumsum(valid) - 1 + offset
        ok = valid & (rank < num_free)
        dest = jnp.where(ok, free_slots[jnp.clip(rank, 0, C - 1)], C)
        for f in PARAM_FIELDS:
            params[f] = params[f].at[dest].set(child_params[f], mode="drop")
        newcomer = newcomer.at[dest].set(True, mode="drop")
        n_alloc = n_alloc + jnp.sum(ok)
        offset = offset + jnp.sum(valid)

    new_alive = new_alive | newcomer
    n_dropped = offset - n_alloc

    # ---- Adam moment surgery: newcomers start with zero moments ---------
    for f in PARAM_FIELDS:
        adam = adam.zero_slots(f, newcomer)

    new_pool = pool.replace(**params, alive=new_alive)
    info = {
        "n_cloned": jnp.sum(clone_mask),
        "n_split": jnp.sum(split_mask),
        "n_pruned": jnp.sum(existing_prune),
        "n_dropped_overflow": n_dropped,
        "num_alive": jnp.sum(new_alive),
    }
    return new_pool, adam, DensifyStats.zeros(C), info


def _bmask(mask: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    return mask.reshape((mask.shape[0],) + (1,) * (like.ndim - 1))


@jax.jit
def reset_opacity(
    pool: GaussianPool, adam: AdamState
) -> Tuple[GaussianPool, AdamState]:
    """opacity <- inverse_sigmoid(min(opacity, 0.01)) on alive slots, with
    the opacity Adam moments zeroed (gaussian_model.py:220-223,339-353)."""
    new_op = transforms.inverse_sigmoid(
        jnp.minimum(pool.get_opacity, 0.01)
    )
    m = pool.alive[:, None]
    return (
        pool.replace(opacity=jnp.where(m, new_op, pool.opacity)),
        adam.zero_field("opacity"),
    )
