"""End-to-end training: synthesize a toy Blender dataset with the oracle,
train from a random init through the full loop (densification, opacity
reset, LR schedule, PLY/ckpt saves), and require a large PSNR gain —
the BASELINE 'lego e2e' slice at toy scale (SURVEY.md §7 build order 2).
"""

import json
import os

import numpy as np
import pytest

from sgs_tpu.utils.config import ModelParams, OptimizationParams, PipelineParams


@pytest.fixture(scope="module")
def toy_dataset(tmp_path_factory):
    from sgs_tpu.utils.toy_scene import make_blender_dataset

    out = str(tmp_path_factory.mktemp("toyscene"))
    gt = make_blender_dataset(
        out, n_train=12, n_test=3, width=48, height=48, n_gaussians=150, seed=3
    )
    return out, gt


def test_blender_loader_roundtrip(toy_dataset):
    src, _ = toy_dataset
    from sgs_tpu.data.readers import read_nerf_synthetic_scene

    info = read_nerf_synthetic_scene(src, True, True)
    assert len(info.train_cameras) == 12
    assert len(info.test_cameras) == 3
    assert info.point_cloud is not None
    assert info.nerf_normalization["radius"] > 0
    # synthesized random cloud persisted
    assert os.path.exists(os.path.join(src, "points3d.ply"))


@pytest.mark.slow
def test_training_improves_psnr(toy_dataset, tmp_path):
    src, _ = toy_dataset
    from sgs_tpu.data.scene import Scene
    from sgs_tpu.train.trainer import training

    model_path = str(tmp_path / "model")
    dataset = ModelParams(
        source_path=src, model_path=model_path, white_background=True, eval=True
    )
    opt = OptimizationParams(
        iterations=250,
        densify_from_iter=40,
        densification_interval=50,
        densify_until_iter=200,
        opacity_reset_interval=10_000,
        position_lr_max_steps=250,
    )
    pipe = PipelineParams(no_tqdm=True)

    # small random init cloud (not the GT points) to prove optimization
    # works; downsample the Blender loader's 100k random cloud to ~1k
    scene = Scene(dataset, pool_capacity=2048, downsample_init=100.0)

    state = training(
        dataset, opt, pipe,
        testing_iterations=[1, 250],
        saving_iterations=[250],
        checkpoint_iterations=[250],
        scene=scene,
    )

    tsv = open(os.path.join(model_path, "losses.tsv")).read().strip().splitlines()
    assert tsv[0].startswith("iteration")
    first = tsv[1].split("\t")
    last = tsv[-1].split("\t")
    psnr_first, psnr_last = float(first[2]), float(last[2])
    print("PSNR", psnr_first, "->", psnr_last)
    assert psnr_last > psnr_first + 4.0, (psnr_first, psnr_last)
    assert psnr_last > 18.0, psnr_last

    # artifacts: PLY snapshot + checkpoint + cfg_args + cameras.json
    ply_path = os.path.join(model_path, "point_cloud/iteration_250/point_cloud.ply")
    assert os.path.exists(ply_path)
    assert os.path.exists(os.path.join(model_path, "chkpnt250.npz"))
    assert os.path.exists(os.path.join(model_path, "cfg_args"))
    assert os.path.exists(os.path.join(model_path, "cameras.json"))

    # the PLY round-trips into a pool with the same alive count
    from sgs_tpu.data.ply import load_gaussian_ply

    arrays = load_gaussian_ply(ply_path, dataset.sh_degree)
    assert arrays["xyz"].shape[0] == int(state.pool.num_alive)

    # checkpoint restores to identical parameters
    from sgs_tpu.train.checkpoint import load_checkpoint

    state2, it2, sh2, _scale = load_checkpoint(
        os.path.join(model_path, "chkpnt250.npz")
    )
    assert it2 == 250
    np.testing.assert_array_equal(
        np.asarray(state2.pool.xyz), np.asarray(state.pool.xyz)
    )


def test_colmap_loader_and_scene(tmp_path):
    from sgs_tpu.utils.toy_scene import make_colmap_dataset
    from sgs_tpu.data.scene import Scene

    src = str(tmp_path / "colmapscene")
    make_colmap_dataset(src, n_views=8, width=32, height=32, n_gaussians=80)
    dataset = ModelParams(source_path=src, model_path=str(tmp_path / "m"), eval=True)
    scene = Scene(dataset, pool_capacity=1024)
    # llffhold=8: one of 8 views goes to test
    assert len(scene.getTrainCameras()) == 7
    assert len(scene.getTestCameras()) == 1
    assert scene.cameras_extent > 0
    cam = scene.getTrainCameras()[0]
    assert cam.gt_image.shape == (3, 32, 32)
    assert int(scene.pool.num_alive) == 400
