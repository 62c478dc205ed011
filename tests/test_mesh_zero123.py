"""Fixture tests for the Zero123 camera loader and the built-in GLB parser.

Reference behavior matched: /root/reference/scene/dataset_readers.py
:232-282 (readCamerasFromZero123 — first-10/rest split, [R|T] .npy pose
with the fork's row flip, 35mm/32mm Blender intrinsics, alpha composite)
and :337-419 (readMeshSyntheticInfo — triangle centroids, paired
*_normalization.json scale+offset, [0,2,1] axis swap with y negation).
The GLB parser itself has no reference analogue (the reference uses
open3d); it is asserted against hand-built binary fixtures.
"""

import json
import math
import os
import struct

import numpy as np
import pytest
from PIL import Image


# ------------------------------------------------------------- fixtures

def _write_zero123_dir(path, n_images=12, size=8):
    """n_images PNGs (RGBA, known alpha) + paired .npy [R|T] poses."""
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(0)
    poses = []
    for i in range(n_images):
        # a proper w2c rotation (rotate about y by a known angle) + translation
        a = 0.3 * i
        R = np.array(
            [
                [math.cos(a), 0.0, math.sin(a)],
                [0.0, 1.0, 0.0],
                [-math.sin(a), 0.0, math.cos(a)],
            ]
        )
        t = np.array([0.1 * i, -0.2, 1.5 + 0.01 * i])
        rt = np.concatenate([R, t[:, None]], axis=1)  # (3, 4)
        np.save(os.path.join(path, f"{i:03d}.npy"), rt)
        poses.append(rt)
        img = np.zeros((size, size, 4), dtype=np.uint8)
        img[..., 0] = 200  # red
        img[..., 3] = 128  # half alpha everywhere
        img[0, 0, 3] = 0  # one fully transparent pixel
        Image.fromarray(img, "RGBA").save(os.path.join(path, f"{i:03d}.png"))
    return poses


def _minimal_glb(path, vertices, faces, translation=None, scale=None):
    """Hand-build a GLB: one mesh/primitive, POSITION + uint16 indices."""
    pos = np.asarray(vertices, np.float32)
    idx = np.asarray(faces, np.uint16).reshape(-1)
    pos_bytes = pos.tobytes()
    idx_bytes = idx.tobytes()
    # 4-byte align the index view
    pad = (-len(pos_bytes)) % 4
    blob = pos_bytes + b"\x00" * pad + idx_bytes
    blob += b"\x00" * ((-len(blob)) % 4)
    node = {"mesh": 0}
    if translation is not None:
        node["translation"] = list(translation)
    if scale is not None:
        node["scale"] = list(scale)
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [node],
        "meshes": [
            {
                "primitives": [
                    {"attributes": {"POSITION": 0}, "indices": 1, "mode": 4}
                ]
            }
        ],
        "accessors": [
            {
                "bufferView": 0,
                "componentType": 5126,
                "count": len(pos),
                "type": "VEC3",
            },
            {
                "bufferView": 1,
                "componentType": 5123,
                "count": len(idx),
                "type": "SCALAR",
            },
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": len(pos_bytes)},
            {
                "buffer": 0,
                "byteOffset": len(pos_bytes) + pad,
                "byteLength": len(idx_bytes),
            },
        ],
        "buffers": [{"byteLength": len(blob)}],
    }
    js = json.dumps(gltf).encode()
    js += b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(blob)
    with open(path, "wb") as f:
        f.write(struct.pack("<III", 0x46546C67, 2, total))
        f.write(struct.pack("<II", len(js), 0x4E4F534A))
        f.write(js)
        f.write(struct.pack("<II", len(blob), 0x004E4942))
        f.write(blob)


# ------------------------------------------------------------ Zero123

def test_zero123_split_and_intrinsics(tmp_path):
    from sgs_tpu.data.readers import read_cameras_from_zero123

    d = str(tmp_path / "z123")
    _write_zero123_dir(d, n_images=12)
    train = read_cameras_from_zero123(d, white_background=True, train_split=True)
    test = read_cameras_from_zero123(d, white_background=True, train_split=False)
    # first-10 / rest split (dataset_readers.py:235-239)
    assert len(train) == 10 and len(test) == 2
    assert train[0].image_name == "000" and test[0].image_name == "010"
    # Blender default 35mm focal on a 32mm sensor (:278-280)
    fov = 2.0 * math.atan(32.0 / (2.0 * 35.0))
    for c in train + test:
        assert c.FovX == pytest.approx(fov) and c.FovY == pytest.approx(fov)
        assert c.width == 8 and c.height == 8


def test_zero123_pose_convention(tmp_path):
    from sgs_tpu.data.readers import read_cameras_from_zero123

    d = str(tmp_path / "z123")
    poses = _write_zero123_dir(d, n_images=12)
    cams = read_cameras_from_zero123(d, white_background=False, train_split=True)
    for i, c in enumerate(cams):
        w2c = poses[i].copy()
        w2c[1:3, :3] *= -1  # the fork's Blender->COLMAP row flip (:255)
        np.testing.assert_allclose(c.R, w2c[:3, :3].T, atol=1e-12)
        np.testing.assert_allclose(c.T, -w2c[:3, 3], atol=1e-12)


def test_zero123_alpha_composite(tmp_path):
    from sgs_tpu.data.readers import read_cameras_from_zero123

    d = str(tmp_path / "z123")
    _write_zero123_dir(d, n_images=10)
    white = read_cameras_from_zero123(d, white_background=True, train_split=True)
    black = read_cameras_from_zero123(d, white_background=False, train_split=True)
    w = np.array(white[0].image)
    b = np.array(black[0].image)
    a = 128.0 / 255.0
    # half-alpha red pixel onto each background (:270-273)
    assert w[1, 1, 0] == int((200 / 255.0 * a + 1.0 * (1 - a)) * 255)
    assert b[1, 1, 0] == int(200 / 255.0 * a * 255)
    # fully transparent pixel is exactly the background
    assert tuple(w[0, 0]) == (255, 255, 255) and tuple(b[0, 0]) == (0, 0, 0)


# ---------------------------------------------------------------- GLB

def test_glb_roundtrip_identity():
    from sgs_tpu.data.mesh import load_glb_triangles

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.uint16)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "m.glb")
        _minimal_glb(p, verts, faces)
        prims = load_glb_triangles(p)
    assert len(prims) == 1
    v, f = prims[0]
    np.testing.assert_allclose(v, verts, atol=0)
    np.testing.assert_array_equal(f, faces.astype(np.int64))


def test_glb_node_transform_applied(tmp_path):
    from sgs_tpu.data.mesh import load_mesh_triangle_centroids

    verts = np.array([[0, 0, 0], [3, 0, 0], [0, 3, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.uint16)
    p = str(tmp_path / "m.glb")
    _minimal_glb(p, verts, faces, translation=[1.0, 2.0, 3.0], scale=[2.0, 2.0, 2.0])
    cents = load_mesh_triangle_centroids(p)
    # centroid (1,1,0) scaled by 2 then translated
    np.testing.assert_allclose(cents, [[3.0, 4.0, 3.0]], atol=1e-6)


def test_glb_decimate_subsample(tmp_path):
    from sgs_tpu.data.mesh import load_mesh_triangle_centroids

    n = 20
    verts = np.zeros((3 * n, 3), np.float32)
    verts[0::3, 0] = np.arange(n)  # distinct centroids along x
    verts[1::3, 0] = np.arange(n)
    verts[2::3, 0] = np.arange(n)
    faces = np.arange(3 * n, dtype=np.uint16).reshape(n, 3)
    p = str(tmp_path / "m.glb")
    _minimal_glb(p, verts, faces)
    full = load_mesh_triangle_centroids(p)
    assert len(full) == n
    half = load_mesh_triangle_centroids(p, decimate_factor=2.0)
    # even subsample to n/decimate_factor faces (reference: quadric
    # decimation to the same count; only the count matters for init)
    assert len(half) == n // 2
    assert set(np.round(half[:, 0]).astype(int)) <= set(range(n))


def test_mesh_scene_normalization_and_axis_swap(tmp_path):
    """read_mesh_scene applies *_normalization.json then the [0,2,1]
    swap + y-negation (dataset_readers.py:389-396)."""
    from sgs_tpu.data.readers import read_mesh_scene

    d = str(tmp_path / "scene")
    _write_zero123_dir(d, n_images=12)
    glb = str(tmp_path / "obj.glb")
    verts = np.array([[0, 0, 0], [6, 0, 0], [0, 6, 0]], np.float32)
    _minimal_glb(glb, verts, np.array([[0, 1, 2]], np.uint16))
    with open(str(tmp_path / "obj_normalization.json"), "w") as f:
        json.dump({"scale": 0.5, "offset": [1.0, 2.0, 3.0]}, f)
    info = read_mesh_scene(
        d, white_background=True, eval_split=True, obj_path=glb
    )
    # centroid (2,2,0) -> *0.5 + offset = (2,3,3) -> swap [0,2,1] =
    # (2,3,3) -> y*-1 = (2,-3,3)
    np.testing.assert_allclose(
        info.point_cloud.points, [[2.0, -3.0, 3.0]], atol=1e-6
    )
    assert len(info.train_cameras) == 10 and len(info.test_cameras) == 2
    assert os.path.exists(info.ply_path)


def test_mesh_scene_max_faces_guard(tmp_path):
    from sgs_tpu.data.readers import read_mesh_scene

    d = str(tmp_path / "scene")
    _write_zero123_dir(d, n_images=10)
    glb = str(tmp_path / "obj.glb")
    verts = np.zeros((6, 3), np.float32)
    _minimal_glb(glb, verts, np.arange(6, dtype=np.uint16).reshape(2, 3))
    with pytest.raises(RuntimeError, match="mesh_max_faces"):
        read_mesh_scene(
            d, white_background=True, eval_split=True, obj_path=glb,
            mesh_max_faces=1,
        )
