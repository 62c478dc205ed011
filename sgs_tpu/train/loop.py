"""Jitted train step + host-side training orchestration.

The per-iteration compute (/root/reference/train.py:79-142) becomes one
jitted `train_step`: render -> (1-l)L1 + l(1-SSIM) -> grads (params and the
screen-space tap) -> masked per-field Adam -> densification-stat update.
The periodic host steps (SH escalation, densify/prune, opacity reset,
saving, eval) stay outside jit, mirroring the reference's no_grad block.

Recompilation boundaries (by design): pool capacity, image resolution,
active SH degree (4 values over a run).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from sgs_tpu.core.camera import Camera
from sgs_tpu.models.gaussians import DensifyStats, GaussianPool
from sgs_tpu.ops.ssim import l1_loss, ssim
from sgs_tpu.render.pipeline import render
from sgs_tpu.train.optim import AdamState, adam_update


@struct.dataclass
class TrainState:
    pool: GaussianPool
    adam: AdamState
    stats: DensifyStats


@partial(
    jax.jit,
    static_argnames=(
        "active_sh_degree", "lambda_dssim", "freeze_xyz", "apply_update",
        "mode", "max_instances", "backend", "max_row_instances",
        "max_kernel_rows",
    ),
    donate_argnums=(0,),
)
def train_step(
    state: TrainState,
    camera: Camera,
    gt_image: jnp.ndarray,  # (3, H, W)
    bg_color: jnp.ndarray,  # (3,)
    lrs: dict,  # per-field scalar arrays (traced, so LR schedule != recompile)
    active_sh_degree: int,
    lambda_dssim: float = 0.2,
    freeze_xyz: bool = False,
    apply_update: bool = True,
    mode: str = "reference",
    max_instances: int = 0,
    backend: str = "xla",
    max_row_instances: int = 0,
    max_kernel_rows: int = 0,
) -> Tuple[TrainState, dict]:
    pool, adam, stats = state.pool, state.adam, state.stats
    n = pool.capacity
    tap0 = jnp.zeros((n, 3), jnp.float32)

    def loss_fn(params, tap):
        p = pool.with_params(params)
        out = render(
            camera, p.render_inputs(active_sh_degree), bg_color, vspace_tap=tap,
            mode=mode, max_instances=max_instances or None, backend=backend,
            max_row_instances=max_row_instances,
            max_kernel_rows=max_kernel_rows,
        )
        image = out["render"]
        ll1 = l1_loss(image, gt_image)
        loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(image, gt_image))
        return loss, (ll1, out["radii"], out["visibility_filter"], out["overflow"])

    (loss, (ll1, radii, visibility, overflow)), (param_grads, tap_grad) = (
        jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            pool.params(), tap0
        )
    )

    # Non-finite gradient guard (round-5 post-mortem): one degenerate
    # splat (f32 overflow in the near-singular covariance chain) poisoned
    # a single backward at flagship iteration 13084 and the NaNs then
    # propagated through Adam into EVERY alive parameter within a step —
    # an unrecoverable collapse the loss value itself never showed
    # (masked compositing keeps the IMAGE finite). Zero the offending
    # gradient elements and surface the count as a metric; identity for
    # healthy steps, and a single bad view then costs one partial update
    # instead of the whole model.
    nonfinite = sum(
        jnp.sum(~jnp.isfinite(g)) for g in jax.tree.leaves(param_grads)
    ) + jnp.sum(~jnp.isfinite(tap_grad))
    param_grads = jax.tree.map(
        lambda g: jnp.where(jnp.isfinite(g), g, 0.0), param_grads
    )
    tap_grad = jnp.where(jnp.isfinite(tap_grad), tap_grad, 0.0)

    if freeze_xyz:
        param_grads = {**param_grads, "xyz": jnp.zeros_like(param_grads["xyz"])}

    new_stats = stats.update(tap_grad, radii, visibility)

    if apply_update:
        new_params, new_adam = adam_update(
            pool.params(), param_grads, adam, lrs, update_mask=pool.alive
        )
        new_pool = pool.with_params(new_params)
    else:
        new_pool, new_adam = pool, adam

    metrics = {
        "loss": loss,
        "l1": ll1,
        "n_visible": jnp.sum(visibility),
        "overflow": overflow,
        "nonfinite_grads": nonfinite,
    }
    return TrainState(pool=new_pool, adam=new_adam, stats=new_stats), metrics


@partial(
    jax.jit,
    static_argnames=(
        "active_sh_degree", "mode", "max_instances", "backend",
        "max_row_instances", "max_kernel_rows",
    ),
)
def eval_render(
    pool: GaussianPool,
    camera: Camera,
    bg_color: jnp.ndarray,
    active_sh_degree: int,
    mode: str = "reference",
    max_instances: int = 0,
    backend: str = "xla",
    max_row_instances: int = 0,
    max_kernel_rows: int = 0,
) -> jnp.ndarray:
    """Clamped render for evaluation (training_report, train.py:191)."""
    out = render(
        camera, pool.render_inputs(active_sh_degree), bg_color,
        mode=mode, max_instances=max_instances or None, backend=backend,
        max_row_instances=max_row_instances,
        max_kernel_rows=max_kernel_rows,
    )
    return jnp.clip(out["render"], 0.0, 1.0)


def _pow2_bucket(total: int, headroom: float) -> int:
    import math

    want = max(4096, int(total * headroom))
    return 1 << math.ceil(math.log2(want))


def _quarter_pow2_bucket(total: int, headroom: float) -> int:
    """Smallest 2^k * {1, 1.25, 1.5, 1.75} >= total*headroom: ~9% mean
    quantization waste vs ~33% for pow2, at ~4x the recompile cadence.
    Used for the per-BAND buckets (4-8x smaller than full-frame ones, so
    pow2 rounding costs a band-proportionally larger slice of step time
    and band recompiles are correspondingly cheaper)."""
    import math

    want = max(4096, int(total * headroom))
    base = 1 << int(math.log2(want))
    for frac in (1.0, 1.25, 1.5, 1.75, 2.0):
        if base * frac >= want:
            return int(base * frac)
    return base * 2


def instance_bucket(
    pool: GaussianPool, camera: Camera, headroom: float = 1.4,
    tight: bool = False,
) -> "int | tuple":
    """Power-of-two instance-capacity bucket for the tiled rasterizer —
    recomputed at densification events so recompiles only happen on
    doubling. tight=True returns (instance_bucket, row_bucket,
    kernel_row_bucket) for the exact ellipse/tile binning
    (render.tiled._build_instances_tight) + the flat-kernel padded-row
    layout (the analytic worst case is ~2x the typical need)."""
    from sgs_tpu.core.projection import project_gaussians
    from sgs_tpu.render.tiled import (
        instance_count,
        instance_count_tight,
        kernel_row_count,
        row_count,
    )

    proj = project_gaussians(
        pool.xyz, pool.get_covariance(), camera.world_view_transform,
        camera.full_proj_transform, camera.tanfovx, camera.tanfovy,
        camera.image_width, camera.image_height,
    )
    valid = (proj["radius"] > 0) & pool.alive
    if not tight:
        total = int(
            instance_count(
                proj["mean2d"], proj["radius"], valid,
                camera.image_width, camera.image_height,
            )
        )
        return _pow2_bucket(total, headroom)
    rows = int(
        row_count(
            proj["mean2d"], proj["radius"], valid,
            camera.image_width, camera.image_height,
        )
    )
    row_bucket = _pow2_bucket(rows, headroom)
    inputs = pool.render_inputs(0)
    total = int(
        instance_count_tight(
            proj["mean2d"], proj["conic"], inputs.opacities[..., 0],
            proj["depth"], proj["radius"], valid,
            camera.image_width, camera.image_height, row_bucket,
        )
    )
    inst_bucket = _pow2_bucket(total, headroom)
    krows = int(
        kernel_row_count(
            proj["mean2d"], proj["conic"], inputs.opacities[..., 0],
            proj["depth"], proj["radius"], valid,
            camera.image_width, camera.image_height,
            inst_bucket, row_bucket,
        )
    )
    # gentler bucket than pow2 (pow2 would land back on the analytic
    # worst case): headroom then round up to 1024 rows (KROWS-aligned)
    krow_bucket = -(-max(int(krows * 1.3), 1024) // 1024) * 1024
    return inst_bucket, row_bucket, krow_bucket


def instance_bucket_sample(
    pool: GaussianPool, cameras, py_rng, k: int = 4, headroom: float = 1.4,
    tight: bool = False,
) -> "int | tuple":
    """instance_bucket over a random sample of k cameras (VERDICT: sizing
    from only the current camera lets deeper views silently overflow)."""
    cams = list(cameras)
    if len(cams) > k:
        cams = py_rng.sample(cams, k)
    buckets = [
        instance_bucket(
            pool, getattr(c, "camera", c), headroom=headroom, tight=tight
        )
        for c in cams
    ]
    if not tight:
        return max(buckets)
    return (
        max(b[0] for b in buckets),
        max(b[1] for b in buckets),
        max(b[2] for b in buckets),
    )
