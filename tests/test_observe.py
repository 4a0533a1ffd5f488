"""Training observability (train/observe.py) + refinement visualizer CLI."""

import os

import numpy as np
import pytest

from opengaussian_tpu.config import Config, ModelConfig, OptimizationConfig
from opengaussian_tpu.data import dataset
from opengaussian_tpu.ops.rasterize import RasterizeConfig
from opengaussian_tpu.train.loop import Trainer
from tests.test_data import make_colmap_scene

RCFG = RasterizeConfig(max_per_tile=128, chunk=32, min_intersections=8192)


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    make_colmap_scene(root, n_views=4)
    return root


def test_dump_intermediate_writes_reference_artifact_set(scene_dir, tmp_path):
    from opengaussian_tpu.train import observe

    scene = dataset.load_scene(scene_dir)
    tiny = OptimizationConfig(
        iterations=40, start_ins_feat_iter=10, start_root_cb_iter=20,
        start_leaf_cb_iter=30, root_node_num=4, leaf_node_num=3,
        densify_from_iter=1000, sam_level=3,
    )
    out = str(tmp_path / "out")
    tr = Trainer(scene, Config(model=ModelConfig(), opt=tiny), out, rcfg=RCFG,
                 autotune_budgets=False)
    tr.train(until=25, log_every=100)

    # stage-0-style dump
    observe.dump_intermediate(tr, 5, "0", 0)
    assert os.path.exists(f"{out}/train_process/gt/00005.png")
    assert os.path.exists(f"{out}/train_process/renders/00005.png")

    # stage-2.1 dump carries the per-stage artifact set
    tr._ensure_pseudo("root")
    observe.dump_intermediate(tr, 21, "2.1", 0)
    sub = f"{out}/train_process/stage2_1"
    assert os.path.exists(f"{sub}/ins_feat/00021.png")
    assert os.path.exists(f"{sub}/ins_feat2/00021.png")
    assert os.path.exists(f"{sub}/silhouette/00021.png")
    assert os.path.exists(f"{sub}/gt_sam_mask_3/00021.png")
    assert os.path.exists(f"{sub}/pseudo_ins_feat/00021_1.png")

    from PIL import Image

    img = np.asarray(Image.open(f"{out}/train_process/renders/00005.png"))
    assert img.shape[-1] == 3 and img.max() > 0


def test_vis_refinement_cli(scene_dir, tmp_path):
    from opengaussian_tpu.cli import vis_refinement

    out = str(tmp_path / "vis")
    vis_refinement.main([
        "-s", scene_dir, "--out", out, "--max_cameras", "2",
        "--max_gaussians", "50",
    ])
    files = os.listdir(out)
    assert "cameras_frustums.png" in files
    assert sum(f.endswith("_before.png") for f in files) == 2
    assert sum(f.endswith("_after.png") for f in files) == 2


def test_mask_palette_stable():
    from opengaussian_tpu.train.observe import mask_palette

    a = mask_palette(10)
    b = mask_palette(5)
    np.testing.assert_array_equal(a[:6], b[:6])
    assert (a[0] == 0).all()


def test_dump_intermediate_sharded_matches_single(scene_dir, tmp_path):
    """Under Trainer(mesh=...) the dump renders through parallel/render
    without gathering, and the PNGs match the single-device dump."""
    from PIL import Image

    from opengaussian_tpu.parallel.mesh import make_mesh
    from opengaussian_tpu.train import observe

    scene = dataset.load_scene(scene_dir)
    tiny = OptimizationConfig(
        iterations=40, start_ins_feat_iter=10, start_root_cb_iter=20,
        start_leaf_cb_iter=30, root_node_num=4, leaf_node_num=3,
        densify_from_iter=1000, sam_level=3,
    )
    out_m = str(tmp_path / "mesh")
    tr = Trainer(scene, Config(model=ModelConfig(), opt=tiny), out_m,
                 rcfg=RCFG, autotune_budgets=False, mesh=make_mesh(8))
    tr.train(until=25, log_every=100)
    tr._ensure_pseudo("root")
    observe.dump_intermediate(tr, 21, "2.1", 0)
    assert len(tr.state.means.sharding.device_set) == 8  # stayed sharded

    # single-device twin on the SAME trained state
    out_s = str(tmp_path / "single")
    tr.mesh = None
    tr.out_dir = out_s
    observe.dump_intermediate(tr, 21, "2.1", 0)

    for rel in ("renders/00021.png", "stage2_1/ins_feat/00021.png",
                "stage2_1/silhouette/00021.png"):
        a = np.asarray(Image.open(f"{out_m}/train_process/{rel}")).astype(int)
        b = np.asarray(Image.open(f"{out_s}/train_process/{rel}")).astype(int)
        assert np.abs(a - b).max() <= 1, rel  # 8-bit rounding only
