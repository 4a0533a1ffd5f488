"""Host-RSS measurement: eager vs lazy scene loading (VERDICT r3 item 10).

Synthesizes a COLMAP scene of --views frames at ScanNet's -r2 resolution
(648x484 PNGs + [4,H,W] int16 SAM + [M,512] CLIP sidecars), then in a
SUBPROCESS per mode: loads the scene, builds the save_memory bundle,
streams 5 one-view windows (the training hot loop), and reports VmRSS from
/proc at each phase. Eager RSS grows with V; lazy RSS holds ~one view.

Run: python tools/mem_lazy.py [--views 60]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H = 648, 484

CHILD = r"""
import json, os, sys
sys.path.insert(0, sys.argv[3])
import jax  # force CPU before anything touches the axon platform pin
jax.config.update("jax_platforms", "cpu")
import numpy as np

def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0

root, mode = sys.argv[1], sys.argv[2]
out = {"baseline_mb": rss_mb()}
from opengaussian_tpu.data import dataset
from opengaussian_tpu.train.loop import bundle_views, bundle_window
scene = dataset.load_scene(root, lazy=(mode == "lazy"))
out["after_load_mb"] = rss_mb()
b = bundle_views(scene.train_views, sam_level=3, device=False)
out["after_bundle_mb"] = rss_mb()
s = 0.0
for i in range(5):
    wview = bundle_window(b, i % b.num_views)
    s += float(np.asarray(wview.gt_images).sum())
out["after_5_windows_mb"] = rss_mb()
out["checksum"] = s
print(json.dumps(out))
"""


def make_scene(root: str, n_views: int):
    from PIL import Image

    from opengaussian_tpu.data import colmap

    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "language_features"), exist_ok=True)
    rng = np.random.default_rng(0)
    cams = {1: colmap.ColmapCamera(
        1, "PINHOLE", W, H, np.array([600.0, 600.0, W / 2, H / 2]))}
    imgs = {}
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        q = np.array([np.cos(ang / 2), 0.0, np.sin(ang / 2), 0.0])
        imgs[i + 1] = colmap.ColmapImage(
            i + 1, q, np.array([0.0, 0.0, 4.0]), 1, f"img_{i:03d}.png")
        im = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        Image.fromarray(im).save(
            os.path.join(root, "images", f"img_{i:03d}.png"))
        sam = np.zeros((4, H, W), np.int16)
        sam[3] = (np.arange(W)[None, :] * 8 // W + 1).astype(np.int16)
        np.save(os.path.join(root, "language_features", f"img_{i:03d}_s.npy"),
                sam)
        np.save(os.path.join(root, "language_features", f"img_{i:03d}_f.npy"),
                rng.random((9, 512)).astype(np.float32))
    colmap.write_cameras_binary(cams, os.path.join(root, "sparse/0/cameras.bin"))
    colmap.write_images_binary(imgs, os.path.join(root, "sparse/0/images.bin"))
    xyz = rng.normal(size=(1000, 3))
    rgb = (rng.random((1000, 3)) * 255).astype(np.uint8)
    colmap.write_points3d_binary(
        xyz, rgb, os.path.join(root, "sparse/0/points3D.bin"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=60)
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = tempfile.mkdtemp(prefix="memlazy_")
    print(f"synthesizing {args.views} views at {W}x{H} ...", flush=True)
    make_scene(root, args.views)

    results = {}
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    for mode in ("eager", "lazy"):
        r = subprocess.run(
            [sys.executable, "-c", CHILD, root, mode, repo],
            capture_output=True, text=True, env=env, timeout=900)
        assert r.returncode == 0, r.stdout + r.stderr
        results[mode] = json.loads(r.stdout.strip().splitlines()[-1])
    assert abs(results["eager"]["checksum"] - results["lazy"]["checksum"]) < 1e-3
    print(f"\n{'phase':>20s} {'eager MB':>10s} {'lazy MB':>10s}")
    for k in ("baseline_mb", "after_load_mb", "after_bundle_mb",
              "after_5_windows_mb"):
        print(f"{k:>20s} {results['eager'][k]:>10.1f} "
              f"{results['lazy'][k]:>10.1f}")
    e = results["eager"]["after_5_windows_mb"] - results["eager"]["baseline_mb"]
    l = results["lazy"]["after_5_windows_mb"] - results["lazy"]["baseline_mb"]
    print(f"\nscene-attributable RSS: eager {e:.0f} MB vs lazy {l:.0f} MB "
          f"({args.views} views; identical pixel checksums)")
    print(json.dumps({"views": args.views, "eager_mb": round(e, 1),
                      "lazy_mb": round(l, 1)}))


if __name__ == "__main__":
    main()
