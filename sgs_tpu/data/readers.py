"""Dataset readers: COLMAP / Blender / Zero123 / Mesh scene loading.

Functional re-implementation of /root/reference/scene/dataset_readers.py
with identical conventions:
  - CameraInfo.R is the camera-to-world rotation (w2c rotation transposed),
    T the world-to-view translation (readColmapCameras / readCamerasFrom-
    Transforms, dataset_readers.py:70-112,189-229);
  - Blender transforms get the OpenGL->COLMAP axis flip and alpha images are
    composited onto the configured background;
  - the eval split for COLMAP is every llffhold-th (8) camera;
  - scene extent = 1.1 x max camera distance from the mean camera center
    (getNerfppNorm, dataset_readers.py:47-68);
  - Blender scenes with no point cloud get a random 100k init cloud in
    [-1.3, 1.3]^3;
  - Zero123: first 10 images are the train split, Blender 35mm/32mm
    intrinsics, `[R|T]` .npy poses with the fork's row flip (:232-282);
  - Mesh: .glb triangle centroids + paired *_normalization.json transform
    (:337-419) via the built-in minimal GLB parser (no open3d).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional

import numpy as np
from PIL import Image

from sgs_tpu.core.projection import focal2fov, fov2focal, world_to_view
from sgs_tpu.core.sh import sh_to_rgb
from sgs_tpu.data import colmap
from sgs_tpu.data.ply import load_point_cloud_ply, save_point_cloud_ply


@dataclass
class CameraInfo:
    uid: int
    R: np.ndarray  # (3,3) camera-to-world rotation
    T: np.ndarray  # (3,) world-to-view translation
    FovY: float
    FovX: float
    image: Image.Image
    image_path: str
    image_name: str
    width: int
    height: int


@dataclass
class BasicPointCloud:
    points: np.ndarray
    colors: np.ndarray
    normals: np.ndarray


@dataclass
class SceneInfo:
    point_cloud: Optional[BasicPointCloud]
    train_cameras: List[CameraInfo]
    test_cameras: List[CameraInfo]
    nerf_normalization: dict
    ply_path: str


def get_nerfpp_norm(cam_infos: List[CameraInfo]) -> dict:
    centers = []
    for cam in cam_infos:
        w2c = world_to_view(cam.R, cam.T)
        centers.append(np.linalg.inv(w2c)[:3, 3])
    centers = np.stack(centers, axis=0)
    avg = centers.mean(axis=0)
    diagonal = float(np.max(np.linalg.norm(centers - avg, axis=1)))
    return {"translate": -avg, "radius": diagonal * 1.1}


# ------------------------------------------------------------------- COLMAP

def read_colmap_scene(path: str, images: Optional[str], eval_split: bool,
                      llffhold: int = 8) -> SceneInfo:
    sparse = os.path.join(path, "sparse/0")
    if not os.path.isdir(sparse):
        sparse = os.path.join(path, "sparse")
    try:
        extr = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
        intr = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    except FileNotFoundError:
        extr = colmap.read_images_text(os.path.join(sparse, "images.txt"))
        intr = colmap.read_cameras_text(os.path.join(sparse, "cameras.txt"))

    reading_dir = images if images else "images"
    cam_infos = []
    for key in extr:
        im = extr[key]
        cam = intr[im.camera_id]
        if cam.model == "SIMPLE_PINHOLE":
            fx = fy = cam.params[0]
        elif cam.model in ("PINHOLE", "OPENCV"):
            # OPENCV: fork ignores the distortion coefficients.
            fx, fy = cam.params[0], cam.params[1]
        else:
            raise ValueError(
                f"Colmap camera model {cam.model} not handled: only "
                "undistorted datasets (PINHOLE or SIMPLE_PINHOLE) supported"
            )
        fovy = focal2fov(fy, cam.height)
        fovx = focal2fov(fx, cam.width)
        image_path = os.path.join(path, reading_dir, os.path.basename(im.name))
        image_name = os.path.basename(image_path).split(".")[0]
        cam_infos.append(
            CameraInfo(
                uid=cam.id,
                R=colmap.qvec2rotmat(im.qvec).T,
                T=np.array(im.tvec),
                FovY=fovy,
                FovX=fovx,
                image=Image.open(image_path),
                image_path=image_path,
                image_name=image_name,
                width=cam.width,
                height=cam.height,
            )
        )
    cam_infos.sort(key=lambda c: c.image_name)

    if eval_split:
        train = [c for i, c in enumerate(cam_infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(cam_infos) if i % llffhold == 0]
    else:
        train, test = cam_infos, []

    norm = get_nerfpp_norm(train)

    ply_path = os.path.join(sparse, "points3D.ply")
    if not os.path.exists(ply_path):
        try:
            xyz, rgb, _ = colmap.read_points3D_binary(
                os.path.join(sparse, "points3D.bin")
            )
        except FileNotFoundError:
            xyz, rgb, _ = colmap.read_points3D_text(
                os.path.join(sparse, "points3D.txt")
            )
        save_point_cloud_ply(ply_path, xyz.astype(np.float32), rgb.astype(np.uint8))
    pcd = _fetch_ply(ply_path)
    return SceneInfo(pcd, train, test, norm, ply_path)


# ------------------------------------------------------------------ Blender

def read_cameras_from_transforms(
    path: str, transformsfile: str, white_background: bool, extension: str = ".png"
) -> List[CameraInfo]:
    cam_infos = []
    with open(os.path.join(path, transformsfile)) as f:
        contents = json.load(f)
    fovx = contents["camera_angle_x"]
    for idx, frame in enumerate(contents["frames"]):
        file_path = frame["file_path"]
        cam_name = os.path.join(path, file_path + extension)
        if not os.path.exists(cam_name) and os.path.exists(os.path.join(path, file_path)):
            cam_name = os.path.join(path, file_path)
        c2w = np.array(frame["transform_matrix"], dtype=np.float64)
        c2w[:3, 1:3] *= -1  # OpenGL/Blender -> COLMAP axes
        w2c = np.linalg.inv(c2w)
        R = w2c[:3, :3].T
        T = w2c[:3, 3]
        image = _composite_background(Image.open(cam_name), white_background)
        fovy = focal2fov(fov2focal(fovx, image.size[0]), image.size[1])
        cam_infos.append(
            CameraInfo(
                uid=idx, R=R, T=T, FovY=fovy, FovX=fovx, image=image,
                image_path=cam_name, image_name=Path(cam_name).stem,
                width=image.size[0], height=image.size[1],
            )
        )
    return cam_infos


def read_nerf_synthetic_scene(
    path: str, white_background: bool, eval_split: bool, extension: str = ".png"
) -> SceneInfo:
    train = read_cameras_from_transforms(
        path, "transforms_train.json", white_background, extension
    )
    test_file = os.path.join(path, "transforms_test.json")
    test = (
        read_cameras_from_transforms(path, "transforms_test.json", white_background, extension)
        if os.path.exists(test_file)
        else []
    )
    if not eval_split:
        train = train + test
        test = []
    norm = get_nerfpp_norm(train)

    ply_path = os.path.join(path, "points3d.ply")
    if not os.path.exists(ply_path):
        num_pts = 100_000
        xyz = np.random.random((num_pts, 3)) * 2.6 - 1.3
        shs = np.random.random((num_pts, 3)) / 255.0
        rgb = np.asarray(sh_to_rgb(shs))
        save_point_cloud_ply(
            ply_path, xyz.astype(np.float32), (rgb * 255).astype(np.uint8)
        )
    pcd = _fetch_ply(ply_path)
    return SceneInfo(pcd, train, test, norm, ply_path)


# ------------------------------------------------------------------ Zero123

def read_cameras_from_zero123(
    path: str, white_background: bool, extension: str = ".png", train_split: bool = True
) -> List[CameraInfo]:
    image_files = sorted(glob.glob(os.path.join(path, "*" + extension)))
    image_files = image_files[:10] if train_split else image_files[10:]
    cam_infos = []
    for idx, frame_path in enumerate(image_files):
        blender_rt = np.load(frame_path.replace(extension, ".npy"))
        w2c = np.array(blender_rt, dtype=np.float64)
        w2c[1:3, :3] *= -1  # fork's Blender->COLMAP row flip (:253)
        R = w2c[:3, :3].T
        T = -w2c[:3, 3]
        image = _composite_background(Image.open(frame_path), white_background)
        fov = focal2fov(35, 32)  # Blender default 35mm focal / 32mm sensor
        cam_infos.append(
            CameraInfo(
                uid=idx, R=R, T=T, FovY=fov, FovX=fov, image=image,
                image_path=frame_path, image_name=Path(frame_path).stem,
                width=image.size[0], height=image.size[1],
            )
        )
    return cam_infos


def read_mesh_scene(
    path: str,
    white_background: bool,
    eval_split: bool,
    obj_path: Optional[str] = None,
    extension: str = ".png",
    decimate_factor: float = 1.0,
    mesh_max_faces: int = -1,
) -> SceneInfo:
    """Mesh/Zero123 scene: init points at mesh triangle centroids."""
    if obj_path is not None:
        train = read_cameras_from_zero123(path, white_background, extension, True)
        test = read_cameras_from_zero123(path, white_background, extension, False)
    else:
        raise NotImplementedError("non-Zero123 mesh datasets (matching reference)")
    if not eval_split:
        train = train + test
        test = []
    norm = get_nerfpp_norm(train)

    mesh_path = obj_path if obj_path else os.path.join(path, "mesh3d.ply")
    from sgs_tpu.data.mesh import load_mesh_triangle_centroids

    xyzs = load_mesh_triangle_centroids(mesh_path, decimate_factor)
    if mesh_max_faces != -1 and len(xyzs) > mesh_max_faces:
        raise RuntimeError(
            f"mesh has {len(xyzs)} faces > mesh_max_faces={mesh_max_faces}"
        )
    norm_json = (obj_path or mesh_path).replace(".glb", "_normalization.json")
    if os.path.exists(norm_json):
        with open(norm_json) as f:
            nd = json.load(f)
        xyzs = xyzs * float(nd["scale"]) + np.asarray(nd["offset"])[None, :]
    xyzs = xyzs[:, [0, 2, 1]].copy()
    xyzs[:, 1] *= -1

    shs = np.float32(np.random.random((len(xyzs), 3)) / 255.0)
    colors = np.asarray(sh_to_rgb(shs))
    ply_path = os.path.join(path, "points3d.ply")
    save_point_cloud_ply(
        ply_path, xyzs.astype(np.float32), (colors * 255).astype(np.uint8)
    )
    pcd = BasicPointCloud(
        points=xyzs.astype(np.float32), colors=colors, normals=np.zeros_like(xyzs)
    )
    return SceneInfo(pcd, train, test, norm, ply_path)


# ------------------------------------------------------------------ helpers

def _composite_background(image: Image.Image, white_background: bool) -> Image.Image:
    data = np.array(image.convert("RGBA"), dtype=np.float64) / 255.0
    bg = np.array([1.0, 1.0, 1.0]) if white_background else np.array([0.0, 0.0, 0.0])
    rgb = data[:, :, :3] * data[:, :, 3:4] + bg * (1 - data[:, :, 3:4])
    return Image.fromarray((rgb * 255.0).astype(np.uint8), "RGB")


def _fetch_ply(path: str) -> Optional[BasicPointCloud]:
    try:
        pts, cols, normals = load_point_cloud_ply(path)
        return BasicPointCloud(points=pts, colors=cols, normals=normals)
    except (OSError, ValueError, KeyError):
        return None


scene_load_type_callbacks = {
    "Colmap": read_colmap_scene,
    "Blender": read_nerf_synthetic_scene,
    "Mesh": read_mesh_scene,
    "Zero123": read_mesh_scene,
}
