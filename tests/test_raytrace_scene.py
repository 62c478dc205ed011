"""Ray-traced procedural dataset: loader round-trip + short-train sanity.

The honest-GT counterpart to toy_scene (ground truth is ray-traced, not
Gaussian-rendered), used for the convergence-evidence runs in PERF_NOTES.
"""

import os

import numpy as np
import pytest

from sgs_tpu.utils.config import ModelParams, OptimizationParams, PipelineParams


@pytest.fixture(scope="module")
def rt_dataset(tmp_path_factory):
    from sgs_tpu.utils.raytrace_scene import make_raytraced_dataset

    out = str(tmp_path_factory.mktemp("rtscene"))
    make_raytraced_dataset(
        out, n_train=6, n_test=2, width=64, height=64, n_init_points=500
    )
    return out


def test_raytraced_loader_roundtrip(rt_dataset):
    from sgs_tpu.data.readers import read_nerf_synthetic_scene

    info = read_nerf_synthetic_scene(rt_dataset, False, True)
    assert len(info.train_cameras) == 6
    assert len(info.test_cameras) == 2
    # the init cloud is the surface-sample ply, not a random one
    assert info.point_cloud.points.shape[0] == 500
    # images are textured: nontrivial variance within each view
    img = np.asarray(info.train_cameras[0].image)
    assert img.std() > 0.05


def test_raytraced_views_consistent(rt_dataset):
    """Different views see the same scene (not degenerate copies)."""
    from sgs_tpu.data.readers import read_nerf_synthetic_scene

    info = read_nerf_synthetic_scene(rt_dataset, False, True)
    a = np.asarray(info.train_cameras[0].image)
    b = np.asarray(info.train_cameras[3].image)
    assert a.shape == b.shape
    assert np.abs(a - b).mean() > 0.01  # genuinely different viewpoints


@pytest.mark.slow
def test_short_train_reduces_loss(rt_dataset, tmp_path):
    from sgs_tpu.train.trainer import training

    model_path = str(tmp_path / "model")
    dataset = ModelParams(
        source_path=rt_dataset, model_path=model_path, eval=True
    )
    opt = OptimizationParams(
        iterations=120,
        densify_from_iter=1_000_000,  # no densify in this smoke
        position_lr_max_steps=120,
    )
    pipe = PipelineParams(no_tqdm=True)
    training(dataset, opt, pipe, [1, 120], [120], [], None, None)
    tsv = os.path.join(model_path, "losses.tsv")
    assert os.path.exists(tsv)
    rows = [l.split("\t") for l in open(tsv).read().strip().splitlines()[1:]]
    assert len(rows) == 2
    first, last = float(rows[0][1]), float(rows[-1][1])
    assert last < first * 0.8, (first, last)
