"""SIBR remote-viewer TCP bridge — wire-compatible with the reference
protocol (/root/reference/gaussian_renderer/network_gui.py):

  client -> server: 4-byte LE length + JSON {resolution_x/y, train, fov_x,
  fov_y, z_near, z_far, shs_python, rot_scale_python, keep_alive,
  scaling_modifier, view_matrix (16 floats), view_projection_matrix}
  with the y/z column sign flips applied server-side;
  server -> client: raw HWC uint8 image bytes, then 4-byte LE length +
  ascii source path.

Module-level singleton state mirrors the reference so training loops use
the same init()/try_connect()/receive()/send() call pattern.
"""

from __future__ import annotations

import json
import socket
from typing import Optional, Tuple

import numpy as np

from sgs_tpu.core.camera import Camera

host = "127.0.0.1"
port = 6009

conn: Optional[socket.socket] = None
addr = None
listener: Optional[socket.socket] = None


def init(wish_host: str, wish_port: int) -> None:
    global host, port, listener
    host, port = wish_host, wish_port
    listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    listener.bind((host, port))
    listener.listen()
    listener.settimeout(0)


def try_connect() -> None:
    global conn, addr
    if listener is None:
        return
    try:
        conn, addr = listener.accept()
        print(f"\nConnected by {addr}")
        conn.settimeout(None)
    except (BlockingIOError, OSError):
        pass


def _read_exact(n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = conn.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("viewer disconnected")
        buf += chunk
    return buf


def read() -> dict:
    length = int.from_bytes(_read_exact(4), "little")
    return json.loads(_read_exact(length).decode("utf-8"))


def send(image_bytes: Optional[bytes], verify: str) -> None:
    if image_bytes is not None:
        conn.sendall(image_bytes)
    conn.sendall(len(verify).to_bytes(4, "little"))
    conn.sendall(bytes(verify, "ascii"))


def receive() -> Tuple:
    """Returns (camera | None, do_training, shs_python, rot_scale_python,
    keep_alive, scaling_modifier) — reference receive():57-86."""
    message = read()
    width = message["resolution_x"]
    height = message["resolution_y"]
    if width == 0 or height == 0:
        return None, None, None, None, None, None

    view = np.array(message["view_matrix"], np.float32).reshape(4, 4)
    view[:, 1] *= -1
    view[:, 2] *= -1
    proj = np.array(message["view_projection_matrix"], np.float32).reshape(4, 4)
    proj[:, 1] *= -1
    cam = Camera.from_matrices(
        view, proj,
        fovx=message["fov_x"], fovy=message["fov_y"],
        width=width, height=height,
    )
    return (
        cam,
        bool(message["train"]),
        bool(message["shs_python"]),
        bool(message["rot_scale_python"]),
        bool(message["keep_alive"]),
        message["scaling_modifier"],
    )


def image_to_bytes(image_chw: np.ndarray) -> bytes:
    """(3, H, W) float -> raw HWC uint8 bytes for send()."""
    img = np.clip(np.asarray(image_chw), 0.0, 1.0)
    return (img.transpose(1, 2, 0) * 255).astype(np.uint8).tobytes()


def disconnect() -> None:
    global conn
    if conn is not None:
        try:
            conn.close()
        except OSError:
            pass
        conn = None


def serve(render_cb, source_path: str, iteration: int, max_iterations: int) -> None:
    """Inline per-iteration GUI serving — the reference's poll loop
    (train_lgm.py:73-87): accept a pending viewer connection, answer render
    requests until the viewer releases the training loop.

    render_cb(camera, scaling_modifier) -> (3, H, W) float image.
    No-op unless init() was called.
    """
    global conn
    if listener is None:
        return
    if conn is None:
        try_connect()
    while conn is not None:
        try:
            cam, do_training, _shs_py, _rs_py, keep_alive, scaling_mod = receive()
            image_bytes = None
            if cam is not None:
                image_bytes = image_to_bytes(render_cb(cam, scaling_mod))
            send(image_bytes, source_path)
            if do_training and (iteration < max_iterations or not keep_alive):
                break
        except Exception:
            conn = None
