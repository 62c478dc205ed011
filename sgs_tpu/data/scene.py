"""Scene — dataset orchestration mirroring /root/reference/scene/__init__.py.

Responsibilities (same order as the reference Scene.__init__:29-101):
dataset-type sniffing by marker file, input.ply + cameras.json provenance
dump into the model dir, camera shuffling, cameras_extent from the NeRF++
normalization radius, per-resolution-scale camera lists, and either loading
a saved iteration's PLY or building the initial pool from the point cloud
(with optional random downsampling).

Differences by design: the Gaussian pool is an immutable pytree, so Scene
*returns* it (scene.pool) instead of mutating a model passed in.
"""

from __future__ import annotations

import json
import os
import random
import shutil
from typing import Dict, List, Optional

import numpy as np

from sgs_tpu.data import ply as ply_io
from sgs_tpu.data.camera_utils import LoadedCamera, camera_list_from_infos, camera_to_json
from sgs_tpu.data.readers import BasicPointCloud, scene_load_type_callbacks
from sgs_tpu.models.gaussians import GaussianPool


def search_for_max_iteration(folder: str) -> Optional[int]:
    if not os.path.isdir(folder):
        return None
    iters = [
        int(name.split("_")[-1])
        for name in os.listdir(folder)
        if name.startswith("iteration_")
    ]
    return max(iters) if iters else None


class Scene:
    def __init__(
        self,
        model_params,
        load_iteration: Optional[int] = None,
        shuffle: bool = True,
        resolution_scales=(1.0,),
        downsample_init: float = 1.0,
        pool_capacity: Optional[int] = None,
    ):
        args = model_params
        self.model_path = args.model_path
        self.loaded_iter = None

        if load_iteration:
            if load_iteration == -1:
                self.loaded_iter = search_for_max_iteration(
                    os.path.join(self.model_path, "point_cloud")
                )
            else:
                self.loaded_iter = load_iteration
            print(f"Loading trained model at iteration {self.loaded_iter}")

        src = args.source_path
        if os.path.exists(os.path.join(src, "mesh3d.ply")):
            scene_info = scene_load_type_callbacks["Mesh"](
                src, args.white_background, args.eval,
                decimate_factor=args.decimate_factor,
            )
        elif os.path.exists(os.path.join(src, "000.npy")):
            scene_info = scene_load_type_callbacks["Zero123"](
                src, args.white_background, args.eval,
                obj_path=args.obj_path, mesh_max_faces=args.mesh_max_faces,
            )
        elif os.path.exists(os.path.join(src, "sparse")):
            scene_info = scene_load_type_callbacks["Colmap"](
                src, args.images, args.eval
            )
        elif os.path.exists(os.path.join(src, "transforms_train.json")):
            scene_info = scene_load_type_callbacks["Blender"](
                src, args.white_background, args.eval
            )
        else:
            raise ValueError(f"Could not recognize scene type in {src}!")
        self.scene_info = scene_info

        if not self.loaded_iter and self.model_path:
            os.makedirs(self.model_path, exist_ok=True)
            shutil.copyfile(
                scene_info.ply_path, os.path.join(self.model_path, "input.ply")
            )
            cams = list(scene_info.test_cameras) + list(scene_info.train_cameras)
            with open(os.path.join(self.model_path, "cameras.json"), "w") as f:
                json.dump([camera_to_json(i, c) for i, c in enumerate(cams)], f)

        if shuffle:
            random.shuffle(scene_info.train_cameras)
            random.shuffle(scene_info.test_cameras)

        self.cameras_extent: float = scene_info.nerf_normalization["radius"]

        self.train_cameras: Dict[float, List[LoadedCamera]] = {}
        self.test_cameras: Dict[float, List[LoadedCamera]] = {}
        for scale in resolution_scales:
            self.train_cameras[scale] = camera_list_from_infos(
                scene_info.train_cameras, scale, args.resolution
            )
            self.test_cameras[scale] = camera_list_from_infos(
                scene_info.test_cameras, scale, args.resolution
            )

        if self.loaded_iter:
            arrays = ply_io.load_gaussian_ply(
                os.path.join(
                    self.model_path,
                    "point_cloud",
                    f"iteration_{self.loaded_iter}",
                    "point_cloud.ply",
                ),
                args.sh_degree,
            )
            self.pool = pool_from_arrays(arrays, args.sh_degree, pool_capacity)
        else:
            pcd = scene_info.point_cloud
            if pcd is None:
                raise ValueError("scene has no initial point cloud")
            if downsample_init != 1.0:
                num = round(len(pcd.points) / downsample_init)
                idx = np.random.choice(len(pcd.points), num, replace=False)
                pcd = BasicPointCloud(
                    points=pcd.points[idx], colors=pcd.colors[idx],
                    normals=pcd.normals[idx],
                )
            self.init_pcd = pcd  # the (possibly downsampled) init cloud
            print(f"Number of points at initialisation : {len(pcd.points)}")
            self.pool = GaussianPool.from_pcd(
                pcd.points, pcd.colors, args.sh_degree, capacity=pool_capacity
            )

    # ------------------------------------------------------------------ API
    def save(self, pool: GaussianPool, iteration: int) -> str:
        path = os.path.join(
            self.model_path, f"point_cloud/iteration_{iteration}", "point_cloud.ply"
        )
        arrays = pool.compact_arrays()
        ply_io.save_gaussian_ply(
            path,
            arrays["xyz"], arrays["features_dc"], arrays["features_rest"],
            arrays["opacity"], arrays["scaling"], arrays["rotation"],
        )
        return path

    def getTrainCameras(self, scale: float = 1.0) -> List[LoadedCamera]:
        return self.train_cameras[scale]

    def getTestCameras(self, scale: float = 1.0) -> List[LoadedCamera]:
        return self.test_cameras[scale]


def pool_from_arrays(arrays: dict, sh_degree: int, capacity: Optional[int] = None) -> GaussianPool:
    """Build a pool from loaded raw parameter arrays (PLY restore path)."""
    import jax.numpy as jnp

    from sgs_tpu.models.gaussians import _default_capacity

    n = arrays["xyz"].shape[0]
    cap = int(capacity or _default_capacity(n))
    pool = GaussianPool.empty(cap, sh_degree)
    idx = jnp.arange(n)
    return pool.replace(
        xyz=pool.xyz.at[idx].set(jnp.asarray(arrays["xyz"])),
        features_dc=pool.features_dc.at[idx].set(jnp.asarray(arrays["features_dc"])),
        features_rest=pool.features_rest.at[idx].set(jnp.asarray(arrays["features_rest"])),
        scaling=pool.scaling.at[idx].set(jnp.asarray(arrays["scaling"])),
        rotation=pool.rotation.at[idx].set(jnp.asarray(arrays["rotation"])),
        opacity=pool.opacity.at[idx].set(jnp.asarray(arrays["opacity"])),
        alive=pool.alive.at[idx].set(True),
    )
