"""LPIPS perceptual metric in JAX — the lpipsPyTorch equivalent.

Re-implements /root/reference/lpipsPyTorch/: a VGG16 (or AlexNet) feature
extractor evaluated at the standard LPIPS tap points, unit-normalized
activations, learned 1x1 "lin" weights, spatial mean, summed over layers.

Weights: this environment has no network egress and no torchvision, so
pretrained backbone + lin weights must be provided as an .npz file (path
via `weights_path` or the SGS_LPIPS_WEIGHTS env var). `lpips_available()`
reports whether weights are present; metrics fall back to reporting null
LPIPS otherwise. The .npz layout is documented in `convert_weights_doc`.

Expected npz keys (VGG16):
  conv{i}_w (HWIO float32), conv{i}_b for i in 0..12 (the 13 conv layers)
  lin{j}_w (1,1,C,1) for j in 0..4
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before) per conv layer
_VGG16_PLAN = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
# taps AFTER relu of these conv indices (relu1_2, 2_2, 3_3, 4_3, 5_3)
_VGG16_TAPS = [1, 3, 6, 9, 12]

# richzhang scaling-layer constants, applied to [0,1] images exactly like
# the reference (lpipsPyTorch/modules/networks.py:41-44 z_score; the repo
# feeds [0,1] tensors at metrics.py:74)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "weights", "lpips_vgg16.npz",
)


def _weights_path(weights_path: Optional[str]) -> str:
    return (
        weights_path
        or os.environ.get("SGS_LPIPS_WEIGHTS")
        or DEFAULT_WEIGHTS_PATH
    )


def _find_pth_pair(npz_path: str):
    """Zero-code drop-in: if the .npz is absent but the ORIGINAL .pth
    files sit in the same directory, ingest them directly.

    Backbone: any torchvision VGG16 state_dict (vgg16*.pth — the
    published file is vgg16-397923af.pth). Lin head: the richzhang
    PerceptualSimilarity v0.1 file (vgg.pth / lpips*.pth), layout
    matching /root/reference/lpipsPyTorch/modules/utils.py:11-30.
    Returns (vgg_pth, lin_pth) or None."""
    d = os.path.dirname(npz_path)
    if not os.path.isdir(d):
        return None
    names = sorted(os.listdir(d))
    vgg = [n for n in names if n.startswith("vgg16") and n.endswith(".pth")]
    lin = [
        n for n in names
        if n.endswith(".pth")
        and (n == "vgg.pth" or n.startswith("lpips"))
    ]
    if vgg and lin:
        return os.path.join(d, vgg[0]), os.path.join(d, lin[0])
    return None


def lpips_available(weights_path: Optional[str] = None) -> bool:
    path = _weights_path(weights_path)
    return os.path.exists(path) or _find_pth_pair(path) is not None


_CACHE = {}


def _load_weights(weights_path: Optional[str]) -> dict:
    path = _weights_path(weights_path)
    if path not in _CACHE:
        if not os.path.exists(path):
            pair = _find_pth_pair(path)
            if pair is None:
                raise FileNotFoundError(path)
            convert_reference_weights(pair[0], pair[1], path)
        z = np.load(path)
        _CACHE[path] = {k: jnp.asarray(z[k]) for k in z.files}
    return _CACHE[path]


def _vgg_features(x: jnp.ndarray, w: dict):
    """x: (B, 3, H, W) in [0,1]. Returns list of tap activations."""
    mean = jnp.asarray(_LPIPS_SHIFT).reshape(1, 3, 1, 1)
    std = jnp.asarray(_LPIPS_SCALE).reshape(1, 3, 1, 1)
    x = (x - mean) / std
    feats = []
    for i, (_, pool_before) in enumerate(_VGG16_PLAN):
        if pool_before:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
        x = jax.lax.conv_general_dilated(
            x, w[f"conv{i}_w"],
            window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        ) + w[f"conv{i}_b"].reshape(1, -1, 1, 1)
        x = jax.nn.relu(x)
        if i in _VGG16_TAPS:
            feats.append(x)
    return feats


@partial(jax.jit, static_argnames=())
def _lpips_jit(x, y, w_list, lin_list):
    def normalize(f):
        # eps ADDED to the norm, not under the sqrt — exact reference
        # semantics (lpipsPyTorch/modules/utils.py:6-8)
        return f / (jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True)) + 1e-10)

    total = 0.0
    fx = _vgg_features(x, w_list)
    fy = _vgg_features(y, w_list)
    for j, (a, b) in enumerate(zip(fx, fy)):
        d = (normalize(a) - normalize(b)) ** 2
        lin = lin_list[f"lin{j}_w"]  # (1, 1, C, 1)
        out = jax.lax.conv_general_dilated(
            d, lin, (1, 1), "VALID",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )
        total = total + jnp.mean(out, axis=(1, 2, 3))
    return total


def lpips(
    img1: jnp.ndarray, img2: jnp.ndarray, net_type: str = "vgg",
    weights_path: Optional[str] = None,
) -> jnp.ndarray:
    """(3,H,W) or (B,3,H,W) images in [0,1] -> LPIPS distance (B,)."""
    if net_type != "vgg":
        raise NotImplementedError("only the vgg backbone is implemented")
    if not lpips_available(weights_path):
        raise FileNotFoundError(
            f"LPIPS weights not found at {_weights_path(weights_path)}; "
            "provide converted VGG16+lin weights (no network egress here). "
            "See sgs_tpu/metrics/lpips.py docstring for the .npz layout."
        )
    w = _load_weights(weights_path)
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    conv = {k: v for k, v in w.items() if k.startswith("conv")}
    lin = {k: v for k, v in w.items() if k.startswith("lin")}
    return _lpips_jit(img1, img2, conv, lin)


# torchvision VGG16 `features` conv layer indices (convs interleaved
# with ReLU/MaxPool in the Sequential) — the state_dict key layout of
# the published vgg16-397923af.pth the reference downloads via
# torchvision (lpipsPyTorch/modules/networks.py:86).
_TORCHVISION_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def convert_reference_weights(
    vgg_pth: str, lin_pth: str, out_path: str
) -> None:
    """Ingest the ACTUAL reference weight files -> .npz.

    vgg_pth: torchvision vgg16 state_dict (`features.{i}.weight/bias`,
    classifier keys ignored) — the file torchvision's
    `vgg16(weights=...)` caches. lin_pth: the richzhang
    PerceptualSimilarity v0.1 lin head (`lin{j}.model.1.weight`, shape
    (1, C, 1, 1)) that the reference downloads
    (/root/reference/lpipsPyTorch/modules/utils.py:11-30); the newer
    `lins.{j}.model.1.weight` key spelling is accepted too."""
    import torch

    sd = torch.load(vgg_pth, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):  # a full pickled Module
        sd = sd.state_dict()
    arrays = {}
    for ci, li in enumerate(_TORCHVISION_VGG16_CONV_IDX):
        w = sd[f"features.{li}.weight"].numpy()  # OIHW
        b = sd[f"features.{li}.bias"].numpy()
        arrays[f"conv{ci}_w"] = w.transpose(2, 3, 1, 0).astype(np.float32)
        arrays[f"conv{ci}_b"] = b.astype(np.float32)
    lin_sd = torch.load(lin_pth, map_location="cpu", weights_only=True)
    for j in range(5):
        for key in (f"lin{j}.model.1.weight", f"lins.{j}.model.1.weight"):
            if key in lin_sd:
                break
        else:
            raise KeyError(f"no lin{j} weight in {lin_pth}")
        w = lin_sd[key].numpy()  # (1, C, 1, 1)
        arrays[f"lin{j}_w"] = w.transpose(2, 3, 1, 0).astype(np.float32)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(out_path, **arrays)


def convert_torchvision_weights(out_path: str) -> None:
    """Offline helper: convert torchvision VGG16 + richzhang lin weights to
    the .npz layout (requires torchvision + downloaded lin weights — run on
    a machine with network access, then ship the .npz)."""
    import torch
    import torchvision

    vgg = torchvision.models.vgg16(weights="DEFAULT").features
    arrays = {}
    conv_idx = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            # torch OIHW -> HWIO
            arrays[f"conv{conv_idx}_w"] = (
                layer.weight.detach().numpy().transpose(2, 3, 1, 0)
            )
            arrays[f"conv{conv_idx}_b"] = layer.bias.detach().numpy()
            conv_idx += 1
    url = (
        "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
        "master/lpips/weights/v0.1/vgg.pth"
    )
    lin_sd = torch.hub.load_state_dict_from_url(url, progress=True, map_location="cpu")
    for j in range(5):
        w = lin_sd[f"lin{j}.model.1.weight"].numpy()  # (1, C, 1, 1)
        arrays[f"lin{j}_w"] = w.transpose(2, 3, 1, 0)  # -> (1, 1, C, 1)
    np.savez(out_path, **arrays)
