"""The reference user's full journey on one scene, chained end-to-end:

  train (all stages + stage 3)  ->  render.py feature maps
  ->  text query (render_lerf_by_text)  ->  click query (render_by_click)

Each CLI is covered piecewise elsewhere; this pins the ARTIFACT WIRING
between them (PLY + codebooks + cluster_lang.npz + feature-map PNGs), which
is what actually breaks when formats drift.

Two deliberate substitutions keep the journey meaningful on a 40-iteration
toy scene (the quality gates involved are reference semantics and are
golden-tested separately):
  * the COLMAP cloud is densified so KNN-init scales pass the leaf-level
    scale<0.1 better_vis cull (reference gaussian_renderer/__init__.py:248);
  * cluster_lang.npz is rewritten with a converged-quality table (a noise
    scene cannot clear the reference's score>0.2 / occu>=5 gates
    (train.py:887, render_lerf_by_text.py:62) in 10 association steps).
"""

import json
import os

import numpy as np
import pytest

from opengaussian_tpu.data import colmap
from tests.test_data import make_colmap_scene

pytestmark = pytest.mark.slow


def test_full_user_journey(tmp_path):
    from opengaussian_tpu.cli import render as cli_render
    from opengaussian_tpu.cli import render_by_click as cli_click
    from opengaussian_tpu.cli import render_by_text as cli_text
    from opengaussian_tpu.cli import train as cli_train

    root = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    make_colmap_scene(root, n_views=5)
    # densify the cloud: 3-NN distances (the KNN scale init) land ~0.06,
    # under the leaf-level 0.1 scale cull the selection renders apply
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(2000, 3)) * 0.5
    rgb = (rng.random((2000, 3)) * 255).astype(np.uint8)
    colmap.write_points3d_binary(
        xyz, rgb, os.path.join(root, "sparse/0/points3D.bin"))

    # 1. train through every stage incl. stage-3 language association
    cli_train.main([
        "-s", root, "-m", out,
        "--iterations", "40",
        "--start_ins_feat_iter", "10",
        "--start_root_cb_iter", "20",
        "--start_leaf_cb_iter", "30",
        "--root_node_num", "3",
        "--leaf_node_num", "2",
        "--sam_level", "3",
        "--test_iterations", "40",
        "--save_iterations", "40",
    ])
    lang_path = os.path.join(out, "cluster_lang.npz")
    lang = np.load(lang_path)
    assert lang["leaf_feat"].shape == (6, 512)

    # 2. feature-map renders (input artifacts for click selection)
    cli_render.main(["-m", out, "-s", root])
    views = sorted(os.listdir(os.path.join(out, "train", "ours", "ins_feat1")))
    assert views
    view = os.path.splitext(views[0])[0]

    # pick a leaf that actually owns points, then write a converged-quality
    # language table targeting it
    from opengaussian_tpu.models.loading import load_model

    state, kms, it = load_model(out, -1)
    leaf_ids = np.asarray(kms.leaf_cls_ids)
    alive = np.asarray(state.alive)
    counts = np.bincount(leaf_ids[alive], minlength=7)[:6]  # drop the
    # k1*k2 "unassigned" bucket (reference kmeans_quantize.py:158-160)
    target = int(np.argmax(counts))
    assert counts[target] >= 10
    feat = np.zeros((6, 512), np.float32)
    feat[target, target] = 1.0
    np.savez(lang_path, leaf_feat=feat,
             leaf_score=np.full(6, 0.9, np.float32),
             occu_count=np.full(6, 10.0, np.float32),
             leaf_ind=lang["leaf_ind"])

    # 3. text query -> selection renders on every frame. Packed as a zip
    # with one text_features.json inside — the reference's bundled
    # assets/text_features.zip layout (render_lerf_by_text.py:69-72), which
    # the CLI accepts as-is.
    import zipfile

    tf_path = str(tmp_path / "text_features.zip")
    with zipfile.ZipFile(tf_path, "w") as z:
        z.writestr("text_features.json",
                   json.dumps({"toy object": feat[target].tolist()}))
    cli_text.main([
        "-m", out, "-s", root, "--scene_name", "toy",
        "--text_features", tf_path, "--texts", "toy object",
    ])
    rgb_dir = os.path.join(out, "text2obj", f"ours_{it}", "renders_cluster")
    renders = sorted(os.listdir(rgb_dir))
    assert len(renders) == 5  # all frames (toy scene: no eval-frame table)
    from PIL import Image

    imgs = [np.asarray(Image.open(os.path.join(rgb_dir, n))) for n in renders]
    # white background: the selected object must tint some pixels
    assert any(im.min() < 250 for im in imgs), "text selection rendered nothing"

    # 4. click query at the brightest feature-map pixel of the first view
    f1 = np.asarray(Image.open(
        os.path.join(out, "train", "ours", "ins_feat1", views[0])))
    y, x = np.unravel_index(np.argmax(f1.sum(axis=-1)), f1.shape[:2])
    cli_click.main([
        "-m", out, "-s", root, "--view", view,
        "--click", str(int(x)), str(int(y)),
    ])
    click_dir = os.path.join(out, "click2obj", f"ours_{it}")
    outs = os.listdir(click_dir)
    assert len(outs) == 5
    img = np.asarray(Image.open(os.path.join(click_dir, outs[0])))
    assert img.shape[-1] == 3
