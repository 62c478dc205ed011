"""Vectorize / PCA analysis model — the MyGaussianModel equivalent.

Re-implements /root/reference/scene/my_gaussian_model.py: flatten a
Gaussian set into (N, 11) shape params [xyz, activated opacity, activated
scale, normalized rotation] + (N, 3K) appearance params (channel-major SH),
the inverse `from_vector` (re-applying inverse activations), normalization
stats, and the PCA low-rank reconstruction experiment. Pairs with
get_psnr.py for compression studies.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from sgs_tpu.models.gaussians import GaussianPool


def vectorized(pool: GaussianPool) -> Tuple[np.ndarray, np.ndarray]:
    """Pool -> (shape_params (N, 11), appearance_params (N, 3K)).

    Only alive rows, in slot order. Shape params use ACTIVATED opacity and
    scale and normalized rotation; appearance is raw SH flattened
    channel-major (my_gaussian_model.py:16-31).
    """
    arrays = pool.compact_arrays()
    xyz = arrays["xyz"]
    opac = 1.0 / (1.0 + np.exp(-arrays["opacity"]))
    scale = np.exp(arrays["scaling"])
    rot = arrays["rotation"]
    rot = rot / np.linalg.norm(rot, axis=-1, keepdims=True)
    n = xyz.shape[0]
    f_dc = np.transpose(arrays["features_dc"], (0, 2, 1)).reshape(n, -1)
    f_rest = np.transpose(arrays["features_rest"], (0, 2, 1)).reshape(n, -1)
    shape_params = np.concatenate([xyz, opac, scale, rot], axis=1)
    appearance_params = np.concatenate([f_dc, f_rest], axis=1)
    return shape_params.astype(np.float32), appearance_params.astype(np.float32)


def from_vector(
    sh_degree: int,
    shape_params: np.ndarray,
    appearance_params: np.ndarray,
    capacity: Optional[int] = None,
) -> GaussianPool:
    """Inverse of vectorized (my_gaussian_model.py:39-58)."""
    from sgs_tpu.data.scene import pool_from_arrays

    n = shape_params.shape[0]
    xyz = shape_params[:, 0:3]
    opac = shape_params[:, 3:4]
    scale = shape_params[:, 4:7]
    rot = shape_params[:, 7:11]
    k = (sh_degree + 1) ** 2
    f_dc = appearance_params[:, :3].reshape(n, 3, 1).transpose(0, 2, 1)
    f_rest = appearance_params[:, 3:].reshape(n, 3, k - 1).transpose(0, 2, 1)
    assert f_rest.shape[1] * f_rest.shape[2] == 3 * k - 3
    eps = 1e-12
    arrays = {
        "xyz": xyz,
        "features_dc": f_dc,
        "features_rest": f_rest,
        "opacity": np.log(np.clip(opac, eps, 1 - eps) / (1 - np.clip(opac, eps, 1 - eps))),
        "scaling": np.log(np.maximum(scale, eps)),
        "rotation": rot,
    }
    return pool_from_arrays(
        {k2: v.astype(np.float32) for k2, v in arrays.items()}, sh_degree, capacity
    )


def compute_normalization(appearance_params: np.ndarray):
    return appearance_params.mean(axis=0), appearance_params.std(axis=0)


def pca_project(
    appearance_params: np.ndarray,
    rank: int,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
):
    """Low-rank PCA reconstruction of the appearance parameters + the
    variance-explained spectrum (my_gaussian_model.py:62-105)."""
    x = appearance_params.astype(np.float64)
    mean = x.mean(axis=0) if mean is None else mean
    x = x - mean[None, :]
    if std is not None:
        std = np.maximum(std, 1e-12)  # constant dims (e.g. zero SH bands)
        x = x / std[None, :]
    cov = x.T @ x
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    ratio = evals / evals.sum()
    q = evecs[:, :rank]
    recon = x @ q @ q.T
    if std is not None:
        recon = recon * std[None, :]
    recon = recon + mean[None, :]
    return recon.astype(np.float32), ratio
