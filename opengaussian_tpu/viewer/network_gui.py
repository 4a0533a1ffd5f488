"""SIBR remote-viewer TCP protocol.

Counterpart of the reference's gaussian_renderer/network_gui.py (wire format
at network_gui.py:26-86; the reference keeps the hookup commented out,
train.py:1057). Non-blocking accept; receives a custom camera + flags,
replies with the rendered RGB bytes. The message layout matches the SIBR
remote viewer: little-endian int32 lengths, float32 matrices.
"""

from __future__ import annotations

import json
import socket
import struct
import traceback

import numpy as np

conn = None
addr = None
listener = None


def init(wish_host: str = "127.0.0.1", wish_port: int = 6009):
    global listener
    listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    listener.bind((wish_host, wish_port))
    listener.listen()
    listener.settimeout(0)


def try_connect():
    global conn, addr
    if listener is None:
        return
    try:
        conn, addr = listener.accept()
        print(f"viewer connected by {addr}")
        conn.settimeout(None)
    except Exception:
        pass


def _read_bytes(n: int) -> bytes:
    out = b""
    while len(out) < n:
        chunk = conn.recv(n - len(out))
        if not chunk:
            raise ConnectionError("viewer disconnected")
        out += chunk
    return out


def read() -> dict:
    (length,) = struct.unpack("<I", _read_bytes(4))
    return json.loads(_read_bytes(length).decode("utf-8"))


def receive():
    """-> (camera dict or None, do_training, keep_alive, scaling_modifier)."""
    msg = read()
    width = msg["resolution_x"]
    height = msg["resolution_y"]
    if width == 0 or height == 0:
        return None, msg["train"], msg["keep_alive"], msg["scaling_modifier"]
    fovy, fovx = msg["fov_y"], msg["fov_x"]
    znear, zfar = msg["z_near"], msg["z_far"]
    # SIBR sends the transposed w2c with flipped Y/Z axes; undo exactly like
    # the reference (network_gui.py:74-76 negates columns 1,2 before use)
    m = np.reshape(np.asarray(msg["view_matrix"], np.float32), (4, 4)).copy()
    m[:, 1] = -m[:, 1]
    m[:, 2] = -m[:, 2]
    w2c = m.T
    cam = dict(width=width, height=height, fovx=fovx, fovy=fovy,
               znear=znear, zfar=zfar, w2c=w2c)
    return cam, msg["train"], msg["keep_alive"], msg["scaling_modifier"]


def send(image_bytes: bytes | None, source_path: str):
    if image_bytes is not None:
        conn.sendall(image_bytes)
    conn.sendall(len(source_path).to_bytes(4, "little"))
    conn.sendall(source_path.encode("utf-8"))


def poll_and_render(render_fn, source_path: str):
    """Non-blocking viewer tick for the train loop: render_fn(cam_dict) ->
    uint8 HxWx3 bytes. Mirrors the reference's loop at train.py:235-248."""
    global conn
    if conn is None:
        try_connect()
    while conn is not None:
        try:
            cam, do_training, keep_alive, scale_mod = receive()
            payload = None
            if cam is not None:
                payload = render_fn(cam, scale_mod)
            send(payload, source_path)
            if do_training and not keep_alive:
                break
        except Exception:
            traceback.print_exc()
            conn = None
