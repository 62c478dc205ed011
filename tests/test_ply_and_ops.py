import os

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from sgs_tpu.data import ply as ply_io
from sgs_tpu.ops.knn import mean_sq_dist_3nn
from sgs_tpu.ops.ssim import l1_loss, psnr, ssim


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, deg = 17, 3
    k = (deg + 1) ** 2
    data = {
        "xyz": rng.normal(size=(n, 3)).astype(np.float32),
        "features_dc": rng.normal(size=(n, 1, 3)).astype(np.float32),
        "features_rest": rng.normal(size=(n, k - 1, 3)).astype(np.float32),
        "opacity": rng.normal(size=(n, 1)).astype(np.float32),
        "scaling": rng.normal(size=(n, 3)).astype(np.float32),
        "rotation": rng.normal(size=(n, 4)).astype(np.float32),
    }
    path = str(tmp_path / "pc.ply")
    ply_io.save_gaussian_ply(
        path, data["xyz"], data["features_dc"], data["features_rest"],
        data["opacity"], data["scaling"], data["rotation"],
    )
    loaded = ply_io.load_gaussian_ply(path, deg)
    for key in data:
        np.testing.assert_array_equal(loaded[key], data[key])


def test_gaussian_ply_roundtrip_sh0(tmp_path):
    """sh_degree-0 snapshots (what train_lgm saves) have NO f_rest
    properties; loading one must not trip on the empty stack (round-5
    regression: the LGM eval chain failed here)."""
    rng = np.random.default_rng(1)
    n = 9
    data = {
        "xyz": rng.normal(size=(n, 3)).astype(np.float32),
        "features_dc": rng.normal(size=(n, 1, 3)).astype(np.float32),
        "features_rest": np.zeros((n, 0, 3), np.float32),
        "opacity": rng.normal(size=(n, 1)).astype(np.float32),
        "scaling": rng.normal(size=(n, 3)).astype(np.float32),
        "rotation": rng.normal(size=(n, 4)).astype(np.float32),
    }
    path = str(tmp_path / "pc0.ply")
    ply_io.save_gaussian_ply(
        path, data["xyz"], data["features_dc"], data["features_rest"],
        data["opacity"], data["scaling"], data["rotation"],
    )
    loaded = ply_io.load_gaussian_ply(path, 0)
    for key in data:
        np.testing.assert_array_equal(loaded[key], data[key])


def test_gaussian_ply_header_matches_reference_layout(tmp_path):
    """Header property list must equal the reference construct_list_of_
    attributes order (byte compatibility for viewers)."""
    path = str(tmp_path / "h.ply")
    n, deg = 3, 1
    k = (deg + 1) ** 2
    ply_io.save_gaussian_ply(
        path,
        np.zeros((n, 3), np.float32), np.zeros((n, 1, 3), np.float32),
        np.zeros((n, k - 1, 3), np.float32), np.zeros((n, 1), np.float32),
        np.zeros((n, 3), np.float32), np.zeros((n, 4), np.float32),
    )
    header = open(path, "rb").read().split(b"end_header")[0].decode()
    props = [ln.split()[-1] for ln in header.splitlines() if ln.startswith("property")]
    expected = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(9)]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    assert props == expected
    assert "binary_little_endian" in header


def test_point_cloud_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    cols = rng.integers(0, 255, size=(10, 3)).astype(np.uint8)
    path = str(tmp_path / "p.ply")
    ply_io.save_point_cloud_ply(path, pts, cols)
    p2, c2, n2 = ply_io.load_point_cloud_ply(path)
    np.testing.assert_array_equal(p2, pts)
    np.testing.assert_allclose(c2, cols / 255.0, atol=1e-7)


def test_ascii_ply_read(tmp_path):
    path = str(tmp_path / "a.ply")
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\n"
            "end_header\n1 2 3\n4 5 6\n"
        )
    v = ply_io.read_ply(path)["vertex"]
    np.testing.assert_allclose([v["x"][1], v["z"][0]], [4.0, 3.0])


def test_knn_matches_bruteforce():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(300, 3)).astype(np.float32)
    got = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts)))
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expected = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-5)


def test_knn_with_duplicates():
    pts = np.array([[0, 0, 0], [0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)
    got = np.asarray(mean_sq_dist_3nn(jnp.asarray(pts)))
    # point 0: neighbors are dup (0), (1,0,0)->1, (2,0,0)->4 => mean 5/3
    np.testing.assert_allclose(got[0], 5 / 3, rtol=1e-5)


def test_ssim_matches_reference_torch():
    """Cross-check against a literal torch transcription of the reference
    SSIM (utils/loss_utils.py:23-63)."""
    rng = np.random.default_rng(3)
    a = rng.uniform(size=(3, 37, 41)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)

    def torch_ssim(img1, img2, window_size=11):
        from math import exp

        sigma = 1.5
        g = torch.tensor(
            [exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)]
        )
        g = (g / g.sum()).unsqueeze(1)
        window = g.mm(g.t()).unsqueeze(0).unsqueeze(0).expand(3, 1, window_size, window_size)
        i1, i2 = torch.tensor(img1)[None], torch.tensor(img2)[None]
        pad, ch = window_size // 2, 3
        mu1 = F.conv2d(i1, window, padding=pad, groups=ch)
        mu2 = F.conv2d(i2, window, padding=pad, groups=ch)
        mu1s, mu2s, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = F.conv2d(i1 * i1, window, padding=pad, groups=ch) - mu1s
        s2 = F.conv2d(i2 * i2, window, padding=pad, groups=ch) - mu2s
        s12 = F.conv2d(i1 * i2, window, padding=pad, groups=ch) - mu12
        c1, c2 = 0.01**2, 0.03**2
        m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1s + mu2s + c1) * (s1 + s2 + c2))
        return float(m.mean())

    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    expected = torch_ssim(a, b)
    np.testing.assert_allclose(got, expected, rtol=1e-4)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.999


def test_psnr_and_l1():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    np.testing.assert_allclose(float(l1_loss(a, b)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-5)
