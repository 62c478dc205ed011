"""Per-attribute Adam with surgery-friendly state, plus LR schedules.

Reproduces the reference's optimizer semantics exactly
(/root/reference/scene/gaussian_model.py:159-177):
  - six param groups (xyz / f_dc / f_rest / opacity / scaling / rotation)
    with individual LRs, shared betas (0.9, 0.999) and eps = 1e-15;
  - torch.optim.Adam bias correction with a single step counter per
    parameter tensor (so densification surgery keeps the old step while
    zeroing moments of new rows — matching cat_tensors_to_optimizer,
    gaussian_model.py:301-337);
  - the Plenoxels log-lerp xyz LR schedule with delay ramp
    (utils/general_utils.py:29-62).

Implemented as explicit pytree state rather than optax so moment surgery
(zero new slots, keep step) is a plain masked `where` on the state arrays.
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import jax.numpy as jnp
from flax import struct

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-15


@struct.dataclass
class AdamState:
    mu: Dict[str, jnp.ndarray]
    nu: Dict[str, jnp.ndarray]
    step: Dict[str, jnp.ndarray]  # per-field scalar int32

    @classmethod
    def init(cls, params: Dict[str, jnp.ndarray]) -> "AdamState":
        zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
        return cls(
            mu=zeros,
            nu={k: jnp.zeros_like(v) for k, v in params.items()},
            step={k: jnp.zeros((), jnp.int32) for k in params},
        )

    def zero_slots(self, field: str, slot_mask: jnp.ndarray) -> "AdamState":
        """Zero the Adam moments of the given pool slots for one field —
        the _prune/cat/replace 'optimizer surgery' equivalent. slot_mask is
        (C,) bool; broadcasting handles trailing param dims."""
        shape = self.mu[field].shape
        m = slot_mask.reshape((shape[0],) + (1,) * (len(shape) - 1))
        return self.replace(
            mu={**self.mu, field: jnp.where(m, 0.0, self.mu[field])},
            nu={**self.nu, field: jnp.where(m, 0.0, self.nu[field])},
        )

    def zero_field(self, field: str) -> "AdamState":
        """replace_tensor_to_optimizer semantics (reset_opacity path)."""
        return self.replace(
            mu={**self.mu, field: jnp.zeros_like(self.mu[field])},
            nu={**self.nu, field: jnp.zeros_like(self.nu[field])},
        )


def adam_update(
    params: Dict[str, jnp.ndarray],
    grads: Dict[str, jnp.ndarray],
    state: AdamState,
    lrs: Dict[str, jnp.ndarray],
    update_mask: jnp.ndarray | None = None,
) -> tuple[Dict[str, jnp.ndarray], AdamState]:
    """One torch-style Adam step over every field.

    update_mask: optional (C,) bool — rows NOT in the mask keep their params
    and moments untouched (dead pool slots). Note the reference updates every
    row of its (dense) arrays; masked dead slots here have zero grads anyway,
    so masking only avoids useless moment decay on dead slots.
    """
    new_params, new_mu, new_nu, new_step = {}, {}, {}, {}
    for k, p in params.items():
        g = grads[k]
        t = state.step[k] + 1
        mu = ADAM_B1 * state.mu[k] + (1.0 - ADAM_B1) * g
        nu = ADAM_B2 * state.nu[k] + (1.0 - ADAM_B2) * (g * g)
        tf = t.astype(jnp.float32)
        bias1 = 1.0 - ADAM_B1**tf
        bias2 = 1.0 - ADAM_B2**tf
        denom = jnp.sqrt(nu) / jnp.sqrt(bias2) + ADAM_EPS
        update = lrs[k] * (mu / bias1) / denom
        p_new = p - update
        if update_mask is not None:
            m = update_mask.reshape((p.shape[0],) + (1,) * (p.ndim - 1))
            p_new = jnp.where(m, p_new, p)
            mu = jnp.where(m, mu, state.mu[k])
            nu = jnp.where(m, nu, state.nu[k])
        new_params[k] = p_new
        new_mu[k] = mu
        new_nu[k] = nu
        new_step[k] = t
    return new_params, AdamState(mu=new_mu, nu=new_nu, step=new_step)


def expon_lr_func(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
) -> Callable[[int], float]:
    """Plenoxels/JaxNeRF continuous log-lerp decay with optional delay ramp
    (utils/general_utils.py:29-62)."""

    def helper(step: int) -> float:
        if step < 0 or (lr_init == 0.0 and lr_final == 0.0):
            return 0.0
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * math.sin(
                0.5 * math.pi * min(max(step / lr_delay_steps, 0.0), 1.0)
            )
        else:
            delay_rate = 1.0
        t = min(max(step / max_steps, 0.0), 1.0)
        log_lerp = math.exp(math.log(lr_init) * (1 - t) + math.log(lr_final) * t)
        return delay_rate * log_lerp

    return helper


def make_lr_dict(opt_cfg, spatial_lr_scale: float, iteration: int) -> Dict[str, float]:
    """Per-field LRs at a given iteration, mirroring training_setup +
    update_learning_rate (gaussian_model.py:159-185)."""
    xyz_sched = expon_lr_func(
        lr_init=opt_cfg.position_lr_init * spatial_lr_scale,
        lr_final=opt_cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps,
    )
    return {
        "xyz": xyz_sched(iteration),
        "features_dc": opt_cfg.feature_lr,
        "features_rest": opt_cfg.feature_lr / 20.0,
        "opacity": opt_cfg.opacity_lr,
        "scaling": opt_cfg.scaling_lr,
        "rotation": opt_cfg.rotation_lr,
    }
