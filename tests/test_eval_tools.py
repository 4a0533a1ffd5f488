import json
import os

import numpy as np
from PIL import Image

from opengaussian_tpu.eval.lerf_iou import evaluate as lerf_eval, mask_iou
from opengaussian_tpu.eval.scannet import calculate_metrics, predict_point_classes
from opengaussian_tpu.cli.render_by_text import select_leaves_by_text
from opengaussian_tpu.cli.render_by_click import select_leaf_by_feature
from opengaussian_tpu.ops.knn import statistical_outlier_mask


def test_scannet_metrics_exact():
    gt = np.array([0, 1, 1, 2, 2, 2, 3])
    pred = np.array([1, 1, 2, 2, 2, 2, 1])
    ious, miou, acc, macc = calculate_metrics(gt, pred, total_classes=4)
    # class 1: gt at {1,2}, pred==1 at {1,6} -> inter {1}, union {1,2,6}
    assert abs(ious[1] - 1 / 3) < 1e-6
    assert abs(ious[2] - 3 / 4) < 1e-6
    assert ious[3] == 0.0
    assert abs(miou - np.mean([1 / 3, 0.75, 0.0])) < 1e-6
    assert abs(acc - 4 / 6) < 1e-6


def test_predict_point_classes():
    rng = np.random.default_rng(0)
    n_leaf, n_cls = 12, 3
    text = rng.normal(size=(n_cls, 512)).astype(np.float32)
    leaf_feat = text[np.arange(n_leaf) % n_cls] + rng.normal(0, 0.01, (n_leaf, 512))
    lang = dict(
        leaf_feat=leaf_feat.astype(np.float32),
        occu_count=np.full(n_leaf, 10.0),
        leaf_ind=np.arange(n_leaf) % n_leaf,
    )
    pred = predict_point_classes(lang, text, n_leaf)
    np.testing.assert_array_equal(pred, (np.arange(n_leaf) % n_cls) + 1)


def test_lerf_iou(tmp_path):
    gt_base = tmp_path / "gt"
    pred_base = tmp_path / "pred"
    frame = "frame_00002"
    os.makedirs(gt_base / frame)
    os.makedirs(pred_base)
    m = np.zeros((20, 20), np.uint8)
    m[5:15, 5:15] = 255
    Image.fromarray(m).save(gt_base / frame / "apple.jpg")  # grayscale jpg
    p = np.zeros((20, 20), np.uint8)
    p[5:15, 5:10] = 255  # half overlap
    Image.fromarray(p).save(pred_base / f"{frame}_apple.png")
    r = lerf_eval(str(gt_base), str(pred_base), "teatime")
    # half-overlapping masks (JPEG edge ringing makes the exact value fuzzy);
    # the other teatime frames have no gt dirs and are skipped
    got = r["per_object"][f"{frame}/apple"]
    assert 0.35 < got < 0.65, got


def test_text_selection_topk_expansion():
    rng = np.random.default_rng(1)
    k1, k2 = 4, 3
    lang = dict(
        leaf_feat=rng.normal(size=(k1 * k2, 512)).astype(np.float32),
        occu_count=np.full(k1 * k2, 10.0),
    )
    text = lang["leaf_feat"][7].copy()
    centers = rng.normal(size=(k1 * k2 + 1, 6)).astype(np.float32)
    centers[8] = centers[7] + 0.01  # near-identical codebook feature
    sel = select_leaves_by_text(text, lang, centers, k2)
    assert sel[0] == 7
    assert 8 in sel.tolist()


def test_click_selection():
    rng = np.random.default_rng(2)
    k1, k2 = 3, 2
    roots = rng.normal(size=(k1, 9)).astype(np.float32)
    leaves = rng.normal(size=(k1 * k2 + 1, 6)).astype(np.float32)
    # build a feature equal to normalized root 1 / leaf 3
    f = leaves[1 * k2 + 1]
    fn = f / np.linalg.norm(f)
    roots[1, :6] = f  # make root 1 the nearest root too
    leaf = select_leaf_by_feature(fn.astype(np.float32), roots, leaves, k2)
    assert leaf == 1 * k2 + 1


def test_outlier_removal():
    rng = np.random.default_rng(3)
    pts = rng.normal(0, 0.1, (200, 3))
    pts[:5] += 10.0  # gross outliers
    keep = statistical_outlier_mask(pts)
    assert not keep[:5].any()
    assert keep[5:].mean() > 0.9


def test_scannet2blender(tmp_path):
    from opengaussian_tpu.cli.scannet2blender import convert

    scan = tmp_path / "scan"
    os.makedirs(scan / "pose")
    os.makedirs(scan / "intrinsic")
    np.savetxt(scan / "intrinsic" / "intrinsic_color.txt", np.eye(4) * 1000)
    for i in range(3):
        c2w = np.eye(4)
        c2w[2, 3] = 3.0
        np.savetxt(scan / "pose" / f"{i}.txt", c2w)
    bad = np.full((4, 4), -np.inf)
    np.savetxt(scan / "pose" / "3.txt", bad)
    out = convert(str(scan))
    d = json.load(open(out))
    assert len(d["frames"]) == 3  # untracked frame dropped
    assert "K" in d["frames"][0]


def test_full_eval_scene_tables_and_skip(tmp_path, capsys):
    """cli/full_eval mirrors the reference's suites (full_eval.py:15-18) and
    runs metrics-only without dataset roots."""
    from opengaussian_tpu.cli import full_eval

    assert full_eval.MIPNERF360_OUTDOOR == [
        "bicycle", "flowers", "garden", "stump", "treehill"]
    assert full_eval.MIPNERF360_INDOOR == ["room", "counter", "kitchen", "bonsai"]
    assert full_eval.TANKS_AND_TEMPLES == ["truck", "train"]
    assert full_eval.DEEP_BLENDING == ["drjohnson", "playroom"]
    assert len(full_eval.ALL_SCENES) == 13

    class A:
        mipnerf360, tanksandtemples, deepblending = "/m", "/t", "/d"

    srcs = full_eval.scene_sources(A)
    assert srcs[0] == ("bicycle", "/m/bicycle", "images_4")
    assert ("room", "/m/room", "images_2") in srcs
    assert ("truck", "/t/truck", "images") in srcs

    full_eval.main(["--skip_training", "--skip_rendering",
                    "--output_path", str(tmp_path / "none")])
    assert "no evaluated scenes" in capsys.readouterr().out
