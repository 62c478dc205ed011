import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sgs_tpu.models.autodecoder import Decoder, get_embedder
from sgs_tpu.models.latent import (
    LatentGaussianModel,
    quaternion_normalize_then_multiply,
)


def torch_decoder_forward(params, x, hidden_sizes, residual=True):
    """Literal transcription of the reference Decoder._forward
    (autodecoder.py:133-171) with norm_layers=[] (plain Linears)."""
    xt = torch.tensor(np.asarray(x))
    num_layers = len(hidden_sizes) + 2
    for layer in range(num_layers - 1):
        w = torch.tensor(np.asarray(params[f"lin{layer}"]["kernel"]))
        b = torch.tensor(np.asarray(params[f"lin{layer}"]["bias"]))
        res = xt
        xt = xt @ w + b
        if layer < num_layers - 2:
            if residual and layer != 0:
                xt = xt + res
            xt = torch.relu(xt)
    return xt.numpy()


def test_decoder_matches_torch_transcription():
    rng = jax.random.PRNGKey(0)
    dec = Decoder(
        latent_size=32, hidden_sizes=[64, 64], output_dim=112, norm_layers=()
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 32))
    params = dec.init(rng, x)["params"]
    got = dec.apply({"params": params}, x)
    expected = torch_decoder_forward(params, x, [64, 64])
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-5, atol=1e-6)


def test_weight_norm_dense_matches_torch():
    """Weight-normalized path vs torch.nn.utils weight_norm semantics."""
    rng = jax.random.PRNGKey(2)
    dec = Decoder(
        latent_size=8, hidden_sizes=[16], output_dim=4, norm_layers=(0, 1),
        weight_norm=True, residual=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (5, 8))
    params = dec.init(rng, x)["params"]
    got = np.asarray(dec.apply({"params": params}, x))

    xt = torch.tensor(np.asarray(x))
    for layer, out_dim in ((0, 16), (1, 4)):
        p = params[f"lin{layer}"]
        v = torch.tensor(np.asarray(p["v"]))  # (in, out)
        g = torch.tensor(np.asarray(p["g"]))
        b = torch.tensor(np.asarray(p["b"]))
        w = v * (g / torch.linalg.norm(v, dim=0))[None, :]
        xt = xt @ w + b
        if layer == 0:
            xt = torch.relu(xt)
    np.testing.assert_allclose(got, xt.numpy(), rtol=2e-5, atol=1e-6)


def test_positional_embedding_shape_and_values():
    embed, dim = get_embedder(10)
    assert dim == 63
    x = jnp.asarray([[0.5, -1.0, 2.0]])
    e = np.asarray(embed(x))
    assert e.shape == (1, 63)
    np.testing.assert_allclose(e[0, :3], [0.5, -1.0, 2.0])
    np.testing.assert_allclose(e[0, 3:6], np.sin([0.5, -1.0, 2.0]), rtol=1e-6)
    np.testing.assert_allclose(e[0, 6:9], np.cos([0.5, -1.0, 2.0]), rtol=1e-6)
    # last frequency is 2^9
    np.testing.assert_allclose(
        e[0, -3:], np.cos(np.array([0.5, -1.0, 2.0]) * 512), rtol=1e-4
    )


def test_quaternion_normalize_then_multiply_matches_reference():
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.normal(size=(20, 4)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(20, 4)), jnp.float32)
    got = np.asarray(quaternion_normalize_then_multiply(a, b))
    # unit norm + nonnegative real part
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, rtol=1e-5)
    assert (got[:, 0] >= 0).all()
    # composition correctness via rotation matrices
    from sgs_tpu.core.transforms import quat_to_rotmat

    Ra = np.asarray(quat_to_rotmat(a))
    Rb = np.asarray(quat_to_rotmat(b))
    Rc = np.asarray(quat_to_rotmat(got))
    np.testing.assert_allclose(Rc, Ra @ Rb, atol=1e-5)


def make_model(m=20, seed=0, **kw):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(m, 3)).astype(np.float32) * 0.4
    cols = rng.uniform(size=(m, 3)).astype(np.float32)
    model = LatentGaussianModel.create(
        jax.random.PRNGKey(seed), np.zeros((1, 3), np.float32), **kw
    )
    return model.create_from_pcd(jax.random.PRNGKey(seed + 1), pts, cols), pts, cols


def test_create_from_pcd_latent_seeding():
    model, pts, cols = make_model()
    lat = np.asarray(model.structure_latents)
    assert (lat[:, 0:7] == 0).all()
    np.testing.assert_allclose(lat[:, 7:11], [[1, 0, 0, 0]] * 20, atol=1e-7)
    from sgs_tpu.core.sh import rgb_to_sh

    np.testing.assert_allclose(lat[:, 11:14], np.asarray(rgb_to_sh(cols)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(model.structure_means), pts)
    # opacity = inverse_sigmoid(0.1)
    np.testing.assert_allclose(
        1 / (1 + np.exp(-np.asarray(model.structure_opacities))), 0.1, rtol=1e-5
    )


def test_decode_shapes_and_composition():
    model, pts, _ = make_model(m=12)
    raw = model.decode()
    n = 12 * 8
    assert raw["xyz"].shape == (n, 3)
    assert raw["opacity"].shape == (n, 1)
    assert raw["scaling"].shape == (n, 3)
    assert raw["rotation"].shape == (n, 4)
    assert raw["features_dc"].shape == (n, 1, 3)
    assert raw["features_rest"].shape == (n, 0, 3)  # sh_degree 0
    # rotations are unit + standardized
    rot = np.asarray(raw["rotation"])
    np.testing.assert_allclose(np.linalg.norm(rot, axis=-1), 1.0, rtol=1e-5)
    # xyz composition: cluster offsets added to structure means
    xyz = np.asarray(raw["xyz"]).reshape(12, 8, 3)
    # mean offset is decoder output — just check they're near the structures
    spread = np.abs(xyz - pts[:, None, :]).max()
    assert spread < 5.0  # decoder init is small-ish


def test_decode_gradients_flow_everywhere():
    model, _, _ = make_model(m=6)

    def loss(params):
        raw = model.with_params(params).decode()
        return sum(jnp.sum(v**2) for v in jax.tree.leaves(raw))

    grads = jax.grad(loss)(model.trainable_params())
    flat = jax.tree_util.tree_leaves_with_path(grads)
    for path, g in flat:
        assert np.isfinite(np.asarray(g)).all(), path
    # every structure param must receive gradient
    for key in ("structure_means", "structure_latents", "structure_opacities"):
        assert float(jnp.abs(grads[key]).max()) > 0, key
    # decoder weights too
    assert float(jnp.abs(jax.tree.leaves(grads["decoder_params"])[0]).max()) > 0


def test_lgm_fit_vector_target():
    """The reference's inline self-test (latent_gaussian_model.py:253-277):
    fit decode() output to a random target; loss must drop sharply."""
    import optax

    model, _, _ = make_model(m=16)
    rng = np.random.default_rng(5)
    target = {
        k: jnp.asarray(rng.normal(size=v.shape).astype(np.float32))
        for k, v in model.decode().items()
    }
    optimizer = optax.adam(0.01, eps=1e-15)
    params = model.trainable_params()
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            raw = model.with_params(p).decode()
            return sum(
                jnp.mean((raw[k] - target[k]) ** 2)
                for k in raw
                if raw[k].size  # features_rest is empty at sh_degree 0
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(120):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < 0.55 * losses[0], (losses[0], losses[-1])


@pytest.mark.slow
def test_lgm_e2e_render_training(tmp_path):
    """Train the LGM on a rendered toy scene end-to-end (train_lgm path)."""
    from sgs_tpu.utils.toy_scene import make_blender_dataset
    from sgs_tpu.utils.config import ModelParams, OptimizationParams, PipelineParams
    from sgs_tpu.data.scene import Scene
    from sgs_tpu.train.lgm_trainer import training_lgm
    from sgs_tpu.ops.ssim import psnr
    from sgs_tpu.render.pipeline import render

    src = str(tmp_path / "scene")
    make_blender_dataset(src, n_train=8, n_test=2, width=40, height=40,
                         n_gaussians=80, seed=11)
    dataset = ModelParams(
        source_path=src, model_path=str(tmp_path / "model"),
        white_background=True, eval=True, sh_degree=0,
    )
    opt = OptimizationParams(iterations=120)
    pipe = PipelineParams(no_tqdm=True)
    scene = Scene(dataset, pool_capacity=1536, downsample_init=100.0)

    model = training_lgm(
        dataset, opt, pipe,
        testing_iterations=[120], saving_iterations=[120],
        checkpoint_iterations=[120], scene=scene,
    )
    # PSNR of the fitted model on a train view beats the empty render
    cam = scene.getTrainCameras()[0]
    out = render(cam.camera, model.render_inputs(0), jnp.ones(3))
    img = jnp.clip(out["render"], 0, 1)
    gt = jnp.asarray(cam.gt_image)
    val = float(psnr(img, gt))
    assert val > 10.0, val

    # checkpoint roundtrip
    import os

    from sgs_tpu.train.lgm_trainer import load_lgm_checkpoint

    ckpt = os.path.join(dataset.model_path, "chkpnt120.npz")
    assert os.path.exists(ckpt)
    model2, it = load_lgm_checkpoint(ckpt, model)
    assert it == 120
    np.testing.assert_array_equal(
        np.asarray(model2.structure_latents), np.asarray(model.structure_latents)
    )
    assert os.path.exists(
        os.path.join(dataset.model_path, "point_cloud/iteration_120/point_cloud.ply")
    )


@pytest.mark.slow
def test_lgm_pallas_tight_training(tmp_path):
    """LGM trainer on the PALLAS backend with tight culling (the
    production TPU configuration; the step previously silently fell back
    to the XLA oracle backend)."""
    from sgs_tpu.utils.toy_scene import make_blender_dataset
    from sgs_tpu.utils.config import ModelParams, OptimizationParams, PipelineParams
    from sgs_tpu.data.scene import Scene
    from sgs_tpu.train.lgm_trainer import training_lgm
    from sgs_tpu.ops.ssim import psnr
    from sgs_tpu.render.pipeline import render

    src = str(tmp_path / "scene")
    make_blender_dataset(src, n_train=6, n_test=2, width=40, height=40,
                         n_gaussians=60, seed=13)
    dataset = ModelParams(
        source_path=src, model_path=str(tmp_path / "model"),
        white_background=True, eval=True, sh_degree=0,
    )
    opt = OptimizationParams(iterations=60)
    pipe = PipelineParams(no_tqdm=True, raster_backend="pallas")
    scene = Scene(dataset, pool_capacity=1024, downsample_init=100.0)

    model = training_lgm(
        dataset, opt, pipe,
        testing_iterations=[60], saving_iterations=[],
        checkpoint_iterations=[], scene=scene,
    )
    cam = scene.getTrainCameras()[0]
    out = render(cam.camera, model.render_inputs(0), jnp.ones(3))
    img = jnp.clip(out["render"], 0, 1)
    val = float(psnr(img, jnp.asarray(cam.gt_image)))
    assert val > 10.0, val
