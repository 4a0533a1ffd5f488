import json
import os

import numpy as np
from PIL import Image

from opengaussian_tpu.data import colmap, dataset, ply


def make_colmap_scene(root, n_views=6, with_sidecars=True):
    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "language_features"), exist_ok=True)
    rng = np.random.default_rng(0)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48, np.array([60.0, 60.0, 32.0, 24.0]))}
    imgs = {}
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        q = np.array([np.cos(ang / 2), 0.0, np.sin(ang / 2), 0.0])
        t = np.array([0.0, 0.0, 4.0])
        imgs[i + 1] = colmap.ColmapImage(i + 1, q, t, 1, f"img_{i:03d}.png")
        im = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(im).save(os.path.join(root, "images", f"img_{i:03d}.png"))
        if with_sidecars:
            sam = np.zeros((4, 48, 64), np.int16)
            sam[3, :24] = 1  # level-3 masks: ids 0,1 on top of lower levels
            sam[3, 24:] = 2
            np.save(os.path.join(root, "language_features", f"img_{i:03d}_s.npy"), sam)
            np.save(
                os.path.join(root, "language_features", f"img_{i:03d}_f.npy"),
                rng.random((3, 512)).astype(np.float32),
            )
    colmap.write_cameras_binary(cams, os.path.join(root, "sparse/0/cameras.bin"))
    colmap.write_images_binary(imgs, os.path.join(root, "sparse/0/images.bin"))
    xyz = rng.normal(size=(200, 3))
    rgb = (rng.random((200, 3)) * 255).astype(np.uint8)
    colmap.write_points3d_binary(xyz, rgb, os.path.join(root, "sparse/0/points3D.bin"))
    return xyz, rgb


def test_colmap_binary_roundtrip(tmp_path):
    root = str(tmp_path)
    xyz, rgb = make_colmap_scene(root)
    cams = colmap.read_cameras_binary(os.path.join(root, "sparse/0/cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 64
    imgs = colmap.read_images_binary(os.path.join(root, "sparse/0/images.bin"))
    assert len(imgs) == 6 and imgs[1].name == "img_000.png"
    x2, r2, _ = colmap.read_points3d_binary(os.path.join(root, "sparse/0/points3D.bin"))
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_array_equal(r2, rgb)


def test_load_colmap_scene(tmp_path):
    root = str(tmp_path)
    make_colmap_scene(root)
    sc = dataset.load_scene(root, eval_split=True)
    assert len(sc.train_views) == 5 and len(sc.test_views) == 1  # llffhold=8
    v = sc.train_views[0]
    assert v.gt_image.shape == (48, 64, 3)
    assert v.sam_mask is not None and v.sam_mask.shape == (4, 48, 64)
    assert v.clip_feats.shape == (3, 512)
    assert sc.cameras_extent > 0
    assert sc.points.shape == (200, 3)
    # view names sorted, split deterministic
    names = [v.image_name for v in sc.train_views]
    assert names == sorted(names)


def test_resolution_policy(tmp_path):
    # -r 2 halves; sam mask stride-2 downsample aligns
    root = str(tmp_path)
    make_colmap_scene(root)
    sc = dataset.load_scene(root, resolution=2)
    v = sc.train_views[0]
    assert v.gt_image.shape == (24, 32, 3)
    assert v.sam_mask.shape == (4, 24, 32)
    assert v.camera.width == 32 and v.camera.height == 24
    # auto-cap only triggers >1600px so 64px stays
    w, h = dataset._choose_resolution(64, 48, -1)
    assert (w, h) == (64, 48)
    w, h = dataset._choose_resolution(3200, 2400, -1)
    assert (w, h) == (1600, 1200)


def test_blender_scene(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    rng = np.random.default_rng(1)
    frames = []
    for i in range(4):
        c2w = np.eye(4)
        # OpenGL camera at +z looking along -z => toward the origin
        c2w[2, 3] = 3.0 + i * 0.1
        frames.append(
            {
                "file_path": f"images/fr_{i}",
                "transform_matrix": c2w.tolist(),
                "K": [[50.0, 0, 20.0], [0, 50.0, 15.0], [0, 0, 1]],
            }
        )
        im = (rng.random((30, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(im).save(os.path.join(root, "images", f"fr_{i}.png"))
    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"frames": frames}, f)
    sc = dataset.load_scene(root)
    assert len(sc.train_views) == 4 and len(sc.test_views) == 0
    v = sc.train_views[0]
    assert v.gt_image.shape == (30, 40, 3)
    assert v.K is not None
    # no init ply -> random 100k points
    assert sc.points.shape == (100_000, 3)
    # OpenGL->COLMAP flip: camera at z=-3 looking along -z in GL becomes
    # +z-forward in COLMAP; the w2c must put the origin in front (z>0)
    cam = v.camera
    origin_cam = np.asarray(cam.world_to_cam(np.zeros((1, 3))))
    assert origin_cam[0, 2] > 0


def test_gaussian_ply_roundtrip(tmp_path):
    from opengaussian_tpu.models.gaussians import create_from_pcd

    rng = np.random.default_rng(2)
    pts = rng.normal(size=(30, 3)).astype(np.float32)
    cols = rng.random((30, 3)).astype(np.float32)
    st = create_from_pcd(pts, cols, capacity=64)
    p = str(tmp_path / "gs.ply")
    ply.save_gaussian_ply(p, st)
    back = ply.load_gaussian_ply(p)
    assert back["means"].shape == (30, 3)
    np.testing.assert_allclose(back["means"], pts, rtol=1e-6)
    np.testing.assert_allclose(back["ins_feat"], np.asarray(st.ins_feat)[:30], rtol=1e-6)
    np.testing.assert_allclose(back["sh_rest"], np.asarray(st.sh_rest)[:30], atol=1e-7)
    np.testing.assert_allclose(back["quats"], np.asarray(st.quats)[:30], rtol=1e-6)


def test_point_cloud_ply_roundtrip(tmp_path):
    xyz = np.random.default_rng(3).normal(size=(50, 3))
    rgb = (np.random.default_rng(4).random((50, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "pc.ply")
    ply.store_point_cloud(p, xyz, rgb)
    pts, cols = ply.load_point_cloud(p)
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_allclose(cols * 255, rgb, atol=0.5)


def test_sam_decode_levels():
    from opengaussian_tpu.utils import masks

    packed = np.zeros((4, 8, 8), np.int16)
    packed[0][:] = 1  # level 0: one mask, max id 1
    packed[3][:4] = 2
    packed[3][4:] = 5
    ids = masks.decode_sam_level(packed, 3)
    # level 3 subtracts (max of level 2 = 0) + 1 then clamps/offsets
    assert set(np.unique(ids)) == {2, 5}
    ids0 = masks.decode_sam_level(packed, 0)
    assert set(np.unique(ids0)) == {2}
