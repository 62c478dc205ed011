"""Instance-capacity overflow: detection (render/train_step metric) and
trainer recovery (bucket regrow instead of silent truncation).

VERDICT r1 weak #3: rasterize_tiled's overflow count was discarded at
render/pipeline.py and views deeper than the bucket silently truncated.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgs_tpu.core import projection
from sgs_tpu.core.camera import Camera
from sgs_tpu.render import GaussianInputs, render
from sgs_tpu.utils.config import ModelParams, OptimizationParams, PipelineParams


def _camera(width=64, height=64):
    fovx = math.radians(60)
    fovy = projection.focal2fov(projection.fov2focal(fovx, width), height)
    return Camera.from_Rt(np.eye(3), np.zeros(3), fovx, fovy, width, height)


def _inputs(n=200, seed=0):
    rng = np.random.default_rng(seed)
    means = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(2, 6, n)],
        axis=-1,
    ).astype(np.float32)
    return GaussianInputs(
        means3d=jnp.asarray(means),
        opacities=jnp.asarray(rng.uniform(0.4, 0.9, (n, 1)).astype(np.float32)),
        scales=jnp.asarray(np.full((n, 3), 0.12, np.float32)),
        rotations=jnp.asarray(np.tile([[1, 0, 0, 0]], (n, 1)).astype(np.float32)),
        colors_precomp=jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32)),
    )


def test_render_reports_overflow():
    cam = _camera()
    g = _inputs()
    bg = jnp.zeros(3)
    big = render(cam, g, bg, mode="tiled", max_instances=8192)
    assert int(big["overflow"]) == 0
    small = render(cam, g, bg, mode="tiled", max_instances=128)
    assert int(small["overflow"]) > 0
    # oracle never overflows
    ref = render(cam, g, bg, mode="reference")
    assert int(ref["overflow"]) == 0


def test_train_step_surfaces_overflow():
    from sgs_tpu.models.gaussians import DensifyStats, GaussianPool
    from sgs_tpu.train.loop import TrainState, train_step
    from sgs_tpu.train.optim import AdamState

    n = 200
    rng = np.random.default_rng(1)
    pts = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(2, 6, n)],
        axis=-1,
    ).astype(np.float32)
    pool = GaussianPool.from_pcd(
        pts, rng.uniform(0, 1, (n, 3)).astype(np.float32), 0,
        capacity=n, knn_dist2=np.full((n,), 0.01, np.float32),
    )
    cam = _camera(48, 48)
    state = TrainState(
        pool=pool, adam=AdamState.init(pool.params()),
        stats=DensifyStats.zeros(n),
    )
    gt = jnp.zeros((3, 48, 48), jnp.float32)
    from sgs_tpu.models.gaussians import PARAM_FIELDS

    lrs = {k: jnp.float32(1e-3) for k in PARAM_FIELDS}
    _, metrics = train_step(
        state, cam, gt, jnp.zeros(3), lrs, active_sh_degree=0,
        mode="tiled", max_instances=128,
    )
    assert int(metrics["overflow"]) > 0


@pytest.mark.slow
def test_trainer_recovers_from_overflow(tmp_path, monkeypatch, capsys):
    """Force a tiny initial bucket; the trainer must detect the overflow,
    warn, and regrow the bucket so later iterations render exactly."""
    from sgs_tpu.utils.toy_scene import make_blender_dataset

    src = str(tmp_path / "scene")
    make_blender_dataset(
        src, n_train=6, n_test=2, width=48, height=48, n_gaussians=80, seed=0
    )

    import sgs_tpu.train.trainer as trainer_mod
    from sgs_tpu.data.scene import Scene

    monkeypatch.setattr(
        trainer_mod, "instance_bucket_sample", lambda *a, **k: 256
    )
    dataset = ModelParams(
        source_path=src, model_path=str(tmp_path / "model"),
        white_background=True, eval=True,
    )
    opt = OptimizationParams(
        iterations=6, densify_from_iter=100, densify_until_iter=1,
        position_lr_max_steps=6,
    )
    scene = Scene(dataset, pool_capacity=1024, downsample_init=100.0)
    trainer_mod.training(
        dataset, opt, PipelineParams(no_tqdm=True),
        testing_iterations=[], saving_iterations=[],
        checkpoint_iterations=[], scene=scene,
    )
    out = capsys.readouterr().out
    assert "instance overflow" in out
    # the regrown bucket must stop further overflow: exactly one warning
    assert out.count("instance overflow") == 1


def test_train_step_guards_nonfinite_grads():
    """A view whose backward produces non-finite gradients (here: NaN in
    the GT image poisons every grad) must not poison the parameters —
    the guard zeroes the bad elements, reports the count, and the step
    completes with finite state (round-5 flagship post-mortem: one
    degenerate splat NaN'd every alive parameter in one step)."""
    from sgs_tpu.models.gaussians import DensifyStats, GaussianPool, PARAM_FIELDS
    from sgs_tpu.train.loop import TrainState, train_step
    from sgs_tpu.train.optim import AdamState

    n = 64
    rng = np.random.default_rng(2)
    pts = np.stack(
        [rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(2, 6, n)],
        axis=-1,
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    def fresh_state():  # train_step donates its input buffers
        pool = GaussianPool.from_pcd(
            pts, cols, 0, capacity=n,
            knn_dist2=np.full((n,), 0.01, np.float32),
        )
        return pool, TrainState(
            pool=pool, adam=AdamState.init(pool.params()),
            stats=DensifyStats.zeros(n),
        )

    cam = _camera(48, 48)
    pool, state = fresh_state()
    lrs = {k: jnp.float32(1e-3) for k in PARAM_FIELDS}

    gt_nan = jnp.full((3, 48, 48), jnp.nan, jnp.float32)
    new_state, metrics = train_step(
        state, cam, gt_nan, jnp.zeros(3), lrs, active_sh_degree=0,
        mode="tiled", max_instances=4096,
    )
    assert int(metrics["nonfinite_grads"]) > 0
    for leaf in jax.tree.leaves(new_state.pool.params()):
        assert bool(jnp.all(jnp.isfinite(leaf))), "guard leaked non-finite"
    for leaf in jax.tree.leaves(new_state.stats):
        assert bool(jnp.all(jnp.isfinite(leaf))), "stats leaked non-finite"

    # healthy step: guard is identity and reports zero
    _, state2 = fresh_state()
    gt = jnp.zeros((3, 48, 48), jnp.float32)
    _, m2 = train_step(
        state2, cam, gt, jnp.zeros(3), lrs, active_sh_degree=0,
        mode="tiled", max_instances=4096,
    )
    assert int(m2["nonfinite_grads"]) == 0
