"""CameraInfo -> device camera + GT image, with the reference's resolution
policy (/root/reference/utils/camera_utils.py:19-60) and camera JSON dump.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from sgs_tpu.core.camera import Camera
from sgs_tpu.core.projection import fov2focal
from sgs_tpu.data.readers import CameraInfo

_WARNED = False


@dataclass
class LoadedCamera:
    """A render camera paired with its ground-truth image (H, W static)."""

    camera: Camera
    gt_image: np.ndarray  # (3, H, W) float32 in [0, 1]
    image_name: str
    uid: int
    colmap_id: int


def pil_to_chw(pil_image, resolution) -> np.ndarray:
    resized = pil_image.resize(resolution)
    arr = np.asarray(resized, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr.transpose(2, 0, 1)


def load_cam(resolution_arg: int, uid: int, info: CameraInfo,
             resolution_scale: float) -> LoadedCamera:
    orig_w, orig_h = info.image.size

    if resolution_arg in (1, 2, 4, 8):
        resolution = (
            round(orig_w / (resolution_scale * resolution_arg)),
            round(orig_h / (resolution_scale * resolution_arg)),
        )
    else:
        if resolution_arg == -1:
            if orig_w > 1600:
                global _WARNED
                if not _WARNED:
                    print(
                        "[ INFO ] Encountered quite large input images "
                        "(>1.6K pixels width), rescaling to 1.6K."
                    )
                    _WARNED = True
                global_down = orig_w / 1600
            else:
                global_down = 1
        else:
            global_down = orig_w / resolution_arg
        scale = float(global_down) * float(resolution_scale)
        resolution = (int(orig_w / scale), int(orig_h / scale))

    chw = pil_to_chw(info.image, resolution)
    gt = np.clip(chw[:3], 0.0, 1.0)
    if chw.shape[0] == 4:
        gt = gt * chw[3:4]  # alpha-mask the GT like the reference Camera

    cam = Camera.from_Rt(
        info.R, info.T, info.FovX, info.FovY, resolution[0], resolution[1]
    )
    return LoadedCamera(
        camera=cam, gt_image=gt.astype(np.float32),
        image_name=info.image_name, uid=uid, colmap_id=info.uid,
    )


def camera_list_from_infos(
    infos: List[CameraInfo], resolution_scale: float, resolution_arg: int
) -> List[LoadedCamera]:
    return [load_cam(resolution_arg, i, c, resolution_scale) for i, c in enumerate(infos)]


def camera_to_json(idx: int, cam: CameraInfo) -> dict:
    rt = np.zeros((4, 4))
    rt[:3, :3] = cam.R.T
    rt[:3, 3] = cam.T
    rt[3, 3] = 1.0
    w2c = np.linalg.inv(rt)
    return {
        "id": idx,
        "img_name": cam.image_name,
        "width": cam.width,
        "height": cam.height,
        "position": w2c[:3, 3].tolist(),
        "rotation": [r.tolist() for r in w2c[:3, :3]],
        "fy": fov2focal(cam.FovY, cam.height),
        "fx": fov2focal(cam.FovX, cam.width),
    }
