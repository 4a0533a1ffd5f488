"""Loopback test for the SIBR remote-viewer protocol (VERDICT r2 item 7).

A fake SIBR client connects to the trainer's viewer socket, sends a MiniCam
payload in the reference wire format (little-endian length + JSON, the
transposed/Y-Z-flipped view matrix of gaussian_renderer/network_gui.py:42-76),
and must get back exactly H*W*3 image bytes + the source-path trailer while
training resumes.
"""

import json
import socket
import struct
import threading

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def sibr_payload(w2c, width, height, fovx, fovy, train=True, keep_alive=False):
    """Encode a camera the way the SIBR client does: the message carries the
    TRANSPOSED w2c with columns 1,2 negated (the reference undoes this at
    network_gui.py:74-76)."""
    m = np.asarray(w2c, np.float32).T.copy()
    m[:, 1] = -m[:, 1]
    m[:, 2] = -m[:, 2]
    msg = dict(
        resolution_x=width, resolution_y=height,
        train=train, fov_y=fovy, fov_x=fovx,
        z_near=0.01, z_far=100.0,
        shs_python=False, rot_scale_python=False,
        keep_alive=keep_alive, scaling_modifier=1.0,
        view_matrix=[float(x) for x in m.reshape(-1)],
        view_projection_matrix=[0.0] * 16,
    )
    data = json.dumps(msg).encode("utf-8")
    return struct.pack("<I", len(data)) + data


def recv_exact(sock, n):
    out = b""
    while len(out) < n:
        chunk = sock.recv(n - len(out))
        assert chunk, "server closed early"
        out += chunk
    return out


def test_viewer_loopback_render_and_resume(tmp_path):
    from opengaussian_tpu.config import Config, ModelConfig, OptimizationConfig
    from opengaussian_tpu.data import dataset
    from opengaussian_tpu.ops.rasterize import RasterizeConfig
    from opengaussian_tpu.train.loop import Trainer
    from tests.test_data import make_colmap_scene

    root = str(tmp_path / "scene")
    make_colmap_scene(root, n_views=2)
    scene = dataset.load_scene(root)
    tiny = OptimizationConfig(
        iterations=4, start_ins_feat_iter=100, start_root_cb_iter=200,
        start_leaf_cb_iter=300, densify_from_iter=100, densify_until_iter=0,
    )
    # free port
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    tr = Trainer(
        scene, Config(model=ModelConfig(), opt=tiny), str(tmp_path / "out"),
        rcfg=RasterizeConfig(max_per_tile=128, chunk=32,
                             min_intersections=8192),
        autotune_budgets=False,
    )
    tr.viewer_port = port  # the CLI sets this from --port (cli/train.py:124)
    tr.train(until=1, log_every=1)  # opens the listener on the first poll

    W, H = 64, 48
    results = {}

    def client():
        c = socket.create_connection(("127.0.0.1", port), timeout=30)
        c.sendall(sibr_payload(np.eye(4), W, H, fovx=1.0, fovy=0.8,
                               train=True, keep_alive=False))
        img = recv_exact(c, H * W * 3)
        (plen,) = struct.unpack("<I", recv_exact(c, 4))
        path = recv_exact(c, plen).decode()
        results["img"] = np.frombuffer(img, np.uint8).reshape(H, W, 3)
        results["path"] = path
        c.close()

    t = threading.Thread(target=client)
    t.start()
    import time

    time.sleep(0.3)  # let the client reach the accept queue
    tr.train(until=3, log_every=1)  # polls the viewer each iteration
    t.join(timeout=60)
    assert not t.is_alive(), "client never got a reply"

    assert results["img"].shape == (H, W, 3)
    assert results["img"].max() > 0, "rendered image is all black"
    assert results["path"]  # source-path trailer came through
    assert tr.iteration == 3  # training resumed after serving the viewer

    # the served image matches a direct render through the same camera
    direct = tr._viewer_render(
        dict(width=W, height=H, fovx=1.0, fovy=0.8,
             w2c=np.eye(4, dtype=np.float32)), 1.0)
    direct = np.frombuffer(direct, np.uint8).reshape(H, W, 3)
    # training advanced between the serve and this render; allow drift but
    # the scene layout must agree
    assert (direct > 0).mean() > 0.1
    covered = (direct > 0).any(-1) | (results["img"] > 0).any(-1)
    agree = ((direct > 0).any(-1) == (results["img"] > 0).any(-1))[covered]
    assert agree.mean() > 0.8
