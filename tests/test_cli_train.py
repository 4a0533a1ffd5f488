"""Smoke test for the training CLI: full run incl. milestones + stage 3."""

import os

import numpy as np

from tests.test_data import make_colmap_scene


def test_cli_train_end_to_end(tmp_path, monkeypatch):
    from opengaussian_tpu.cli import train as cli_train

    root = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    make_colmap_scene(root, n_views=5)
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
    assert os.path.exists(os.path.join(out, "cfg_args.json"))
    pc = os.path.join(out, "point_cloud", "iteration_40", "point_cloud.ply")
    assert os.path.exists(pc)
    lang = os.path.join(out, "cluster_lang.npz")
    assert os.path.exists(lang)
    d = np.load(lang)
    assert d["leaf_feat"].shape == (6, 512)  # k1*k2 leaves x CLIP dim
    assert set(d.files) >= {"leaf_feat", "leaf_score", "occu_count", "leaf_ind"}
