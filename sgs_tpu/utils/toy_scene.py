"""Synthetic dataset synthesis for tests/benchmarks (no-network substitute
for NeRF-Synthetic): sample a ground-truth Gaussian scene, render views on
a camera circle with the reference rasterizer, and write them as a
Blender-format dataset (transforms_{train,test}.json + PNGs) — exercising
the same loader path real datasets use. Optionally also emits a COLMAP
binary sparse layout for loader coverage.
"""

from __future__ import annotations

import json
import math
import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from sgs_tpu.core.camera import Camera
from sgs_tpu.core.projection import focal2fov, fov2focal
from sgs_tpu.render import GaussianInputs, render


def sample_gt_gaussians(n: int = 300, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    # A blobby object inside [-1, 1]^3 with position-correlated colors.
    centers = rng.normal(size=(8, 3)) * 0.45
    which = rng.integers(0, len(centers), n)
    pts = centers[which] + rng.normal(size=(n, 3)) * 0.18
    colors = np.clip(0.5 + 0.45 * pts + rng.normal(size=(n, 3)) * 0.08, 0.02, 0.98)
    scales = np.exp(rng.uniform(-3.6, -2.4, (n, 3)))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacity = rng.uniform(0.55, 0.95, (n, 1))
    return {
        "means3d": pts.astype(np.float32),
        "scales": scales.astype(np.float32),
        "rotations": quats.astype(np.float32),
        "opacity": opacity.astype(np.float32),
        "colors": colors.astype(np.float32),
    }


def sample_gt_gaussians_hard(n: int = 4000, seed: int = 0) -> dict:
    """Harder GT: a textured occluding shell + interior clutter.

    High-frequency position-driven color (sinusoidal 'texture'), thin
    anisotropic splats on a bumpy sphere shell that occludes a distinct
    inner core — exercises depth ordering, early termination and
    densification growth far more than the blobby default (VERDICT r1
    'quality-parity evidence' item)."""
    rng = np.random.default_rng(seed)
    n_shell = int(n * 0.7)
    n_core = n - n_shell
    # bumpy sphere shell, radius ~0.9 with lumps
    u = rng.normal(size=(n_shell, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    bump = 0.9 + 0.12 * np.sin(5.0 * u[:, 0:1] * 3.1) * np.cos(
        4.0 * u[:, 1:2] * 2.7
    )
    shell = u * bump
    core = rng.normal(size=(n_core, 3)) * 0.3
    pts = np.concatenate([shell, core])
    # high-frequency multi-band texture
    phase = pts @ np.array([[7.1, 2.3, 5.9], [1.7, 9.2, 3.1], [4.3, 2.9, 8.7]]).T
    colors = np.clip(
        0.5
        + 0.35 * np.sin(phase)
        + 0.12 * np.sin(3.7 * phase[:, [1, 2, 0]])
        + rng.normal(size=(n, 3)) * 0.03,
        0.02,
        0.98,
    )
    # thin anisotropic shell splats (flattened along the normal)
    log_s = rng.uniform(-4.4, -3.2, (n, 3))
    log_s[:n_shell, 0] -= 1.2  # flatten one axis
    scales = np.exp(log_s)
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    opacity = np.concatenate(
        [rng.uniform(0.75, 0.98, (n_shell, 1)), rng.uniform(0.4, 0.9, (n_core, 1))]
    )
    return {
        "means3d": pts.astype(np.float32),
        "scales": scales.astype(np.float32),
        "rotations": quats.astype(np.float32),
        "opacity": opacity.astype(np.float32),
        "colors": colors.astype(np.float32),
    }


def circle_pose(theta: float, radius: float = 3.2, height: float = 0.6) -> np.ndarray:
    """Camera-to-world matrix (COLMAP convention: x right, y down, z forward)
    on a circle looking at the origin."""
    eye = np.array(
        [radius * math.cos(theta), height, radius * math.sin(theta)]
    )
    forward = -eye / np.linalg.norm(eye)  # toward origin
    world_up = np.array([0.0, -1.0, 0.0])  # y down convention
    right = np.cross(world_up, forward)
    right /= np.linalg.norm(right)
    down = np.cross(forward, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, forward, eye
    return c2w


def camera_from_c2w(c2w: np.ndarray, fovx: float, width: int, height: int) -> Camera:
    w2c = np.linalg.inv(c2w)
    R = w2c[:3, :3].T
    T = w2c[:3, 3]
    fovy = focal2fov(fov2focal(fovx, width), height)
    return Camera.from_Rt(R, T, fovx, fovy, width, height)


def render_gt(gt: dict, camera: Camera, bg=(1.0, 1.0, 1.0)) -> np.ndarray:
    out = render(
        camera,
        GaussianInputs(
            means3d=jnp.asarray(gt["means3d"]),
            opacities=jnp.asarray(gt["opacity"]),
            scales=jnp.asarray(gt["scales"]),
            rotations=jnp.asarray(gt["rotations"]),
            colors_precomp=jnp.asarray(gt["colors"]),
        ),
        bg_color=jnp.asarray(bg, jnp.float32),
    )
    return np.clip(np.asarray(out["render"]), 0.0, 1.0)


def make_blender_dataset(
    out_dir: str,
    n_train: int = 16,
    n_test: int = 4,
    width: int = 64,
    height: int = 64,
    n_gaussians: int = 300,
    seed: int = 0,
    white_background: bool = True,
    fovx: float = math.radians(50.0),
    variant: str = "blobby",  # "blobby" | "hard" (textured occluding shell)
) -> dict:
    """Write a Blender-format dataset; returns the GT gaussian dict."""
    sampler = (
        sample_gt_gaussians_hard if variant == "hard" else sample_gt_gaussians
    )
    gt = sampler(n_gaussians, seed)
    bg = (1.0, 1.0, 1.0) if white_background else (0.0, 0.0, 0.0)

    for split, count, offset in (
        ("train", n_train, 0.0),
        ("test", n_test, 0.123),
    ):
        frames = []
        split_dir = os.path.join(out_dir, split)
        os.makedirs(split_dir, exist_ok=True)
        for i in range(count):
            theta = 2 * math.pi * i / count + offset
            c2w = circle_pose(theta)
            cam = camera_from_c2w(c2w, fovx, width, height)
            img = render_gt(gt, cam, bg)
            Image.fromarray(
                (img.transpose(1, 2, 0) * 255).astype(np.uint8)
            ).save(os.path.join(split_dir, f"r_{i}.png"))
            # Blender JSON stores OpenGL-convention camera-to-world.
            c2w_gl = c2w.copy()
            c2w_gl[:3, 1:3] *= -1
            frames.append(
                {
                    "file_path": f"./{split}/r_{i}",
                    "transform_matrix": c2w_gl.tolist(),
                }
            )
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fovx, "frames": frames}, f)
    return gt


def make_colmap_dataset(
    out_dir: str,
    n_views: int = 12,
    width: int = 64,
    height: int = 64,
    n_gaussians: int = 300,
    n_points: int = 400,
    seed: int = 0,
) -> dict:
    """Write a COLMAP binary-format dataset rendered from the same GT."""
    from sgs_tpu.data import colmap

    gt = sample_gt_gaussians(n_gaussians, seed)
    fovx = math.radians(50.0)
    focal = fov2focal(fovx, width)
    os.makedirs(os.path.join(out_dir, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)

    cams = {
        1: colmap.ColmapCamera(
            1, "PINHOLE", width, height,
            np.array([focal, focal, width / 2, height / 2]),
        )
    }
    colmap.write_cameras_binary(os.path.join(out_dir, "sparse/0/cameras.bin"), cams)

    imgs = {}
    for i in range(n_views):
        theta = 2 * math.pi * i / n_views
        c2w = circle_pose(theta)
        w2c = np.linalg.inv(c2w)
        qvec = colmap.rotmat2qvec(w2c[:3, :3])
        tvec = w2c[:3, 3]
        name = f"img_{i:03d}.png"
        cam = camera_from_c2w(c2w, fovx, width, height)
        img = render_gt(gt, cam, (0.0, 0.0, 0.0))
        Image.fromarray((img.transpose(1, 2, 0) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, "images", name)
        )
        imgs[i + 1] = colmap.ColmapImage(i + 1, qvec, tvec, 1, name)
    colmap.write_images_binary(os.path.join(out_dir, "sparse/0/images.bin"), imgs)

    rng = np.random.default_rng(seed + 1)
    idx = rng.integers(0, n_gaussians, n_points)
    pts = gt["means3d"][idx] + rng.normal(size=(n_points, 3)) * 0.02
    rgb = (gt["colors"][idx] * 255).astype(np.uint8)
    colmap.write_points3D_binary(
        os.path.join(out_dir, "sparse/0/points3D.bin"), pts, rgb
    )
    return gt
