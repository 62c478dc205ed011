"""Checkpoint/resume — the capture()/restore() equivalent.

The reference persists (active_sh_degree, six param tensors, max_radii2D,
densification accumulators, Adam state_dict, spatial_lr_scale) + iteration
via torch.save (/root/reference/scene/gaussian_model.py:67-99,
train.py:144-146). Here the same contents go into a single .npz with
explicit keys (portable, no pickle).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from sgs_tpu.models.gaussians import DensifyStats, GaussianPool, PARAM_FIELDS
from sgs_tpu.train.loop import TrainState
from sgs_tpu.train.optim import AdamState


def save_checkpoint(
    path: str,
    state: TrainState,
    iteration: int,
    active_sh_degree: int,
    spatial_lr_scale: float,
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for f in PARAM_FIELDS:
        arrays[f"param_{f}"] = np.asarray(getattr(state.pool, f))
        arrays[f"adam_mu_{f}"] = np.asarray(state.adam.mu[f])
        arrays[f"adam_nu_{f}"] = np.asarray(state.adam.nu[f])
        arrays[f"adam_step_{f}"] = np.asarray(state.adam.step[f])
    arrays["alive"] = np.asarray(state.pool.alive)
    arrays["xyz_gradient_accum"] = np.asarray(state.stats.xyz_gradient_accum)
    arrays["denom"] = np.asarray(state.stats.denom)
    arrays["max_radii2d"] = np.asarray(state.stats.max_radii2d)
    arrays["iteration"] = np.asarray(iteration)
    arrays["active_sh_degree"] = np.asarray(active_sh_degree)
    arrays["max_sh_degree"] = np.asarray(state.pool.max_sh_degree)
    arrays["spatial_lr_scale"] = np.asarray(spatial_lr_scale)
    np.savez(path, **arrays)


def load_checkpoint(path: str) -> Tuple[TrainState, int, int, float]:
    """Returns (state, iteration, active_sh_degree, spatial_lr_scale)."""
    z = np.load(path, allow_pickle=False)
    max_sh_degree = int(z["max_sh_degree"])
    pool = GaussianPool(
        **{f: jnp.asarray(z[f"param_{f}"]) for f in PARAM_FIELDS},
        alive=jnp.asarray(z["alive"]),
        max_sh_degree=max_sh_degree,
    )
    adam = AdamState(
        mu={f: jnp.asarray(z[f"adam_mu_{f}"]) for f in PARAM_FIELDS},
        nu={f: jnp.asarray(z[f"adam_nu_{f}"]) for f in PARAM_FIELDS},
        step={f: jnp.asarray(z[f"adam_step_{f}"]) for f in PARAM_FIELDS},
    )
    stats = DensifyStats(
        xyz_gradient_accum=jnp.asarray(z["xyz_gradient_accum"]),
        denom=jnp.asarray(z["denom"]),
        max_radii2d=jnp.asarray(z["max_radii2d"]),
    )
    return (
        TrainState(pool=pool, adam=adam, stats=stats),
        int(z["iteration"]),
        int(z["active_sh_degree"]),
        float(z["spatial_lr_scale"]),
    )
