"""End-to-end render CLI: train a tiny scene, save artifacts, render via
python -m opengaussian_tpu.cli.render (reference render.py:33-116)."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_cli_render_end_to_end(tmp_path, monkeypatch):
    from opengaussian_tpu.cli import render as cli_render
    from opengaussian_tpu.config import Config, ModelConfig, OptimizationConfig
    from opengaussian_tpu.data import dataset
    from opengaussian_tpu.ops.rasterize import RasterizeConfig
    from opengaussian_tpu.train.loop import Trainer
    from tests.test_data import make_colmap_scene

    root = str(tmp_path / "scene")
    make_colmap_scene(root, n_views=3)
    scene = dataset.load_scene(root)
    tiny = OptimizationConfig(
        iterations=6, start_ins_feat_iter=2, start_root_cb_iter=100,
        start_leaf_cb_iter=200, densify_from_iter=100, densify_until_iter=0,
        root_node_num=4, leaf_node_num=3, sam_level=3,
    )
    out = str(tmp_path / "out")
    tr = Trainer(
        scene, Config(model=ModelConfig(source_path=root), opt=tiny), out,
        rcfg=RasterizeConfig(max_per_tile=128, chunk=32,
                             min_intersections=8192),
        autotune_budgets=False,
    )
    tr.train(until=6, log_every=10)
    tr.save()
    assert os.path.exists(f"{out}/point_cloud/iteration_6/point_cloud.ply")

    cli_render.main(["-m", out, "-s", root])

    base = f"{out}/train/ours"
    names = sorted(os.listdir(f"{base}/renders"))
    assert len(names) >= 2
    from PIL import Image

    img = np.asarray(Image.open(os.path.join(base, "renders", names[0])))
    assert img.shape[-1] == 3 and img.max() > 0
    for sub in ("gt", "ins_feat1", "ins_feat2"):
        assert len(os.listdir(os.path.join(base, sub))) == len(names), sub
