"""render.py / metrics.py / get_psnr.py / vectorized-model pipeline tests."""

import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    """A tiny trained model + dataset for the eval tools."""
    from sgs_tpu.utils.toy_scene import make_blender_dataset
    from sgs_tpu.utils.config import ModelParams, OptimizationParams, PipelineParams
    from sgs_tpu.data.scene import Scene
    from sgs_tpu.train.trainer import training

    root = tmp_path_factory.mktemp("evaltools")
    src = str(root / "scene")
    make_blender_dataset(src, n_train=8, n_test=2, width=40, height=40,
                         n_gaussians=100, seed=21)
    model_path = str(root / "model")
    dataset = ModelParams(
        source_path=src, model_path=model_path, white_background=True, eval=True
    )
    opt = OptimizationParams(
        iterations=60, densify_from_iter=1000, densify_until_iter=0,
        position_lr_max_steps=60,
    )
    scene = Scene(dataset, pool_capacity=1536, downsample_init=100.0)
    training(
        dataset, opt, PipelineParams(no_tqdm=True),
        testing_iterations=[60], saving_iterations=[60],
        checkpoint_iterations=[60], scene=scene,
    )
    return src, model_path


def test_render_cli(trained_model):
    src, model_path = trained_model
    import render as render_cli

    render_cli.main(["-m", model_path, "-s", src, "--quiet", "-w", "--eval"])
    renders = os.path.join(model_path, "test", "ours_60", "renders")
    gts = os.path.join(model_path, "test", "ours_60", "gt")
    assert sorted(os.listdir(renders)) == ["00000.png", "00001.png"]
    assert len(os.listdir(gts)) == 2
    # renders should be close to gt (trained for a bit)
    from PIL import Image

    r = np.asarray(Image.open(os.path.join(renders, "00000.png")), np.float32)
    g = np.asarray(Image.open(os.path.join(gts, "00000.png")), np.float32)
    assert np.mean(np.abs(r - g)) < 60.0  # grossly sane


def test_render_cli_cfg_args_only(trained_model):
    """The sentinel merge (reference arguments/__init__.py:30-46,97-117):
    render.py with ONLY -m must recover source_path/eval/white_background
    from the persisted cfg_args instead of clobbering them with parser
    defaults."""
    src, model_path = trained_model
    from argparse import ArgumentParser

    from sgs_tpu.utils.config import (
        ModelParams, add_dataclass_args, extract_dataclass,
        get_combined_args,
    )

    parser = ArgumentParser()
    add_dataclass_args(parser, ModelParams, "Loading", sentinel=True)
    merged = get_combined_args(parser, ["-m", model_path])
    dataset = extract_dataclass(ModelParams, merged)
    assert dataset.source_path == os.path.abspath(src)
    assert dataset.eval is True and dataset.white_background is True
    # explicit CLI still overrides the persisted value
    merged = get_combined_args(parser, ["-m", model_path, "-s", "/elsewhere"])
    assert extract_dataclass(ModelParams, merged).source_path == "/elsewhere"


def test_metrics_cli(trained_model):
    _, model_path = trained_model
    import metrics as metrics_cli

    metrics_cli.main(["-m", model_path])
    with open(os.path.join(model_path, "results.json")) as f:
        results = json.load(f)
    method = results["ours_60"]
    assert 0.0 < method["SSIM"] <= 1.0
    assert method["PSNR"] > 10.0
    with open(os.path.join(model_path, "per_view.json")) as f:
        per_view = json.load(f)
    assert len(per_view["ours_60"]["PSNR"]) == 2


def test_get_psnr_cli_with_checkpoint(trained_model, tmp_path, capsys):
    src, model_path = trained_model
    import get_psnr

    out_dir = str(tmp_path / "psnr_out")
    get_psnr.main([
        "-s", src, "-m", out_dir, "-w", "--eval", "--quiet",
        "--start_checkpoint", os.path.join(model_path, "chkpnt60.npz"),
    ])
    tsv = open(os.path.join(out_dir, "losses.tsv")).read().splitlines()
    assert len(tsv) == 2
    psnr_val = float(tsv[1].split("\t")[2])
    assert psnr_val > 10.0


def test_get_psnr_cli_with_vectorized(trained_model, tmp_path):
    """The raw vectorized N x (11+3K) tensor path (compression harness)."""
    src, model_path = trained_model
    from sgs_tpu.train.checkpoint import load_checkpoint
    from sgs_tpu.models.vectorized import vectorized

    state, _, _, _ = load_checkpoint(os.path.join(model_path, "chkpnt60.npz"))
    shape_p, app_p = vectorized(state.pool)
    vec = np.concatenate([shape_p, app_p], axis=1)
    vec_path = str(tmp_path / "vec.npy")
    np.save(vec_path, vec)

    import get_psnr

    out_dir = str(tmp_path / "psnr_vec")
    get_psnr.main([
        "-s", src, "-m", out_dir, "-w", "--eval", "--quiet",
        "--start_checkpoint", vec_path,
    ])
    tsv = open(os.path.join(out_dir, "losses.tsv")).read().splitlines()
    psnr_val = float(tsv[1].split("\t")[2])
    assert psnr_val > 10.0


def test_vectorized_roundtrip(trained_model):
    _, model_path = trained_model
    from sgs_tpu.train.checkpoint import load_checkpoint
    from sgs_tpu.models.vectorized import from_vector, vectorized

    state, _, _, _ = load_checkpoint(os.path.join(model_path, "chkpnt60.npz"))
    shape_p, app_p = vectorized(state.pool)
    pool2 = from_vector(3, shape_p, app_p)
    shape_p2, app_p2 = vectorized(pool2)
    np.testing.assert_allclose(shape_p2, shape_p, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(app_p2, app_p, rtol=1e-5, atol=1e-6)


def test_pca_projection_properties():
    from sgs_tpu.models.vectorized import compute_normalization, pca_project

    rng = np.random.default_rng(0)
    # low-rank data + noise
    basis = rng.normal(size=(5, 48))
    coeffs = rng.normal(size=(500, 5))
    data = (coeffs @ basis + rng.normal(size=(500, 48)) * 0.01).astype(np.float32)
    recon, ratio = pca_project(data, rank=5)
    assert ratio[:5].sum() > 0.99
    np.testing.assert_allclose(recon, data, atol=0.1)
    mean, std = compute_normalization(data)
    recon_n, _ = pca_project(data, rank=5, mean=mean, std=std)
    assert recon_n.shape == data.shape


def test_lpips_gated():
    from sgs_tpu.metrics.lpips import lpips, lpips_available

    if not lpips_available():
        with pytest.raises(FileNotFoundError):
            import jax.numpy as jnp

            lpips(jnp.zeros((3, 32, 32)), jnp.zeros((3, 32, 32)))


def test_convert_cli_missing_colmap(tmp_path):
    """convert.py exits cleanly with guidance when COLMAP isn't installed."""
    import convert

    with pytest.raises(SystemExit) as e:
        convert.main(["-s", str(tmp_path), "--colmap_executable",
                      "definitely_not_colmap_xyz"])
    assert e.value.code == 1


def test_full_eval_metrics_only(trained_model, tmp_path, monkeypatch):
    """full_eval.py's metrics stage drives metrics.py over the scene list."""
    import full_eval

    calls = []
    monkeypatch.setattr(full_eval, "run", lambda cmd: calls.append(cmd))
    full_eval.main([
        "--skip_training", "--skip_rendering", "--output_path", str(tmp_path)
    ])
    assert len(calls) == 1
    assert "metrics.py" in calls[0][1]
    # all 13 benchmark scenes enumerated
    assert sum("bicycle" in c or "truck" in c or "playroom" in c
               for c in calls[0]) >= 3
    assert len(calls[0]) == 3 + 13  # python metrics.py -m + 13 scene dirs


def test_no_none_dataclass_defaults():
    """extract_dataclass treats None as 'not specified' (the sentinel /
    cfg_args merge contract) and silently falls back to the dataclass
    default — sound only while no field has a None DEFAULT with its own
    meaning. Pin that invariant (ADVICE r4)."""
    from dataclasses import fields

    from sgs_tpu.utils.config import (
        ModelParams,
        OptimizationParams,
        PipelineParams,
    )

    for cls in (ModelParams, OptimizationParams, PipelineParams):
        for f in fields(cls):
            if f.name.startswith("_"):
                continue
            assert f.default is not None, (
                f"{cls.__name__}.{f.name} defaults to None — give "
                "extract_dataclass an explicit MISSING marker first"
            )


def test_bool_flags_expressible_false(trained_model):
    """--no-<flag> overrides a True persisted in cfg_args (ADVICE r4:
    store_true sentinels made False unreachable from the render CLI)."""
    from argparse import ArgumentParser

    from sgs_tpu.utils.config import (
        ModelParams,
        add_dataclass_args,
        extract_dataclass,
        get_combined_args,
    )

    _, model_path = trained_model  # cfg_args has eval=True
    parser = ArgumentParser()
    add_dataclass_args(parser, ModelParams, "Loading", sentinel=True)
    merged = get_combined_args(parser, ["--model_path", model_path])
    assert extract_dataclass(ModelParams, merged).eval is True
    merged = get_combined_args(
        parser, ["--model_path", model_path, "--no-eval"]
    )
    assert extract_dataclass(ModelParams, merged).eval is False
    # positive flags and shorthands unchanged
    merged = get_combined_args(
        parser, ["--model_path", model_path, "-w", "--eval"]
    )
    got = extract_dataclass(ModelParams, merged)
    assert got.eval is True and got.white_background is True
