"""network_gui loopback protocol test + view.py/analyze_model.py CLIs."""

import json
import os
import socket
import sys
import threading

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_network_gui_loopback():
    """Drive the TCP protocol exactly like the SIBR remote viewer would."""
    from sgs_tpu.viewer import network_gui

    network_gui.init("127.0.0.1", 0)
    port = network_gui.listener.getsockname()[1]

    view = np.eye(4, dtype=np.float32)
    msg = {
        "resolution_x": 32, "resolution_y": 24, "train": 1,
        "fov_x": 1.0, "fov_y": 0.8, "z_near": 0.01, "z_far": 100.0,
        "shs_python": 0, "rot_scale_python": 0, "keep_alive": 1,
        "scaling_modifier": 1.0,
        "view_matrix": view.ravel().tolist(),
        "view_projection_matrix": view.ravel().tolist(),
    }

    received = {}

    def client():
        c = socket.create_connection(("127.0.0.1", port), timeout=5)
        payload = json.dumps(msg).encode()
        c.sendall(len(payload).to_bytes(4, "little") + payload)
        img = b""
        want = 32 * 24 * 3
        while len(img) < want:
            img += c.recv(want - len(img))
        received["image"] = img
        ln = int.from_bytes(c.recv(4), "little")
        received["path"] = c.recv(ln).decode()
        c.close()

    th = threading.Thread(target=client)
    th.start()
    # server side: poll accept, receive, render-ish reply
    import time

    for _ in range(100):
        network_gui.try_connect()
        if network_gui.conn is not None:
            break
        time.sleep(0.05)
    assert network_gui.conn is not None
    cam, do_training, shs_py, rs_py, keep_alive, scale = network_gui.receive()
    assert cam is not None
    assert cam.image_width == 32 and cam.image_height == 24
    assert do_training and keep_alive and scale == 1.0
    # the y/z sign flips were applied
    wvt = np.asarray(cam.world_view_transform)
    assert wvt[1, 1] == -1.0 and wvt[2, 2] == -1.0

    fake = np.random.default_rng(0).uniform(size=(3, 24, 32)).astype(np.float32)
    network_gui.send(network_gui.image_to_bytes(fake), "/data/scene")
    th.join(timeout=5)
    assert len(received["image"]) == 32 * 24 * 3
    assert received["path"] == "/data/scene"
    network_gui.disconnect()


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    from sgs_tpu.data.ply import save_gaussian_ply

    rng = np.random.default_rng(0)
    n, deg = 50, 3
    k = (deg + 1) ** 2
    root = tmp_path_factory.mktemp("viewer")
    model = root / "model"
    ply = model / "point_cloud" / "iteration_77" / "point_cloud.ply"
    save_gaussian_ply(
        str(ply),
        rng.normal(size=(n, 3)).astype(np.float32) * 0.3,
        rng.normal(size=(n, 1, 3)).astype(np.float32),
        np.zeros((n, k - 1, 3), np.float32),
        rng.normal(size=(n, 1)).astype(np.float32),
        rng.uniform(-4, -2, (n, 3)).astype(np.float32),
        np.tile(np.array([[1, 0, 0, 0]], np.float32), (n, 1)),
    )
    return str(model), str(ply)


def test_view_cli(tiny_model, tmp_path):
    model, _ = tiny_model
    import view

    out = str(tmp_path / "orbit")
    view.main(["-m", model, "--frames", "3", "--width", "48",
               "--image_height", "48", "--out", out])
    assert sorted(os.listdir(out)) == [
        "frame_000.png", "frame_001.png", "frame_002.png", "orbit.gif"
    ]


def test_analyze_cli(tiny_model, tmp_path):
    _, ply = tiny_model
    import analyze_model

    out = str(tmp_path / "analysis")
    analyze_model.main(["--ply", ply, "--out", out, "--rank", "2"])
    files = os.listdir(out)
    assert "opacities_hist.svg" in files
    assert "appearance_normalized_PCA_variance_explained.svg" in files
    assert os.path.exists(
        os.path.join(out + "_ply_unnorm", "point_cloud.ply")
    )


def test_network_gui_serve_loop():
    """serve() (the trainers' per-iteration poll) answers a render request
    then releases the loop when training is allowed to continue."""
    from sgs_tpu.viewer import network_gui

    network_gui.init("127.0.0.1", 0)
    port = network_gui.listener.getsockname()[1]
    view = np.eye(4, dtype=np.float32)
    msg = {
        "resolution_x": 16, "resolution_y": 16, "train": 1,
        "fov_x": 1.0, "fov_y": 1.0, "z_near": 0.01, "z_far": 100.0,
        "shs_python": 0, "rot_scale_python": 0, "keep_alive": 0,
        "scaling_modifier": 0.5,
        "view_matrix": view.ravel().tolist(),
        "view_projection_matrix": view.ravel().tolist(),
    }
    got = {}

    def client():
        c = socket.create_connection(("127.0.0.1", port), timeout=5)
        payload = json.dumps(msg).encode()
        c.sendall(len(payload).to_bytes(4, "little") + payload)
        img = b""
        while len(img) < 16 * 16 * 3:
            img += c.recv(16 * 16 * 3 - len(img))
        got["image"] = img
        ln = int.from_bytes(c.recv(4), "little")
        got["path"] = c.recv(ln).decode()
        c.close()

    th = threading.Thread(target=client)
    th.start()

    calls = {}

    def render_cb(cam, scaling_modifier):
        calls["cam"] = cam
        calls["sm"] = scaling_modifier
        return np.full((3, cam.image_height, cam.image_width), 0.5, np.float32)

    import time

    deadline = time.time() + 5
    while time.time() < deadline:
        network_gui.serve(render_cb, "/src/scene", iteration=1, max_iterations=10)
        if "image" in got:
            break
        time.sleep(0.05)
    th.join(timeout=5)
    assert got["path"] == "/src/scene"
    assert calls["sm"] == 0.5
    assert calls["cam"].image_width == 16
    assert len(got["image"]) == 16 * 16 * 3
    assert got["image"][0] == 127  # 0.5 * 255
    network_gui.disconnect()
    network_gui.listener.close()
    network_gui.listener = None
