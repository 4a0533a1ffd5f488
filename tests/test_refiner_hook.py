import dataclasses

import numpy as np

from opengaussian_tpu.config import Config, OptimizationConfig
from opengaussian_tpu.data import dataset
from opengaussian_tpu.ops.rasterize import RasterizeConfig
from opengaussian_tpu.train.loop import Trainer
from tests.test_data import make_colmap_scene


def test_refiner_hook_in_trainer(tmp_path):
    root = str(tmp_path / "scene")
    make_colmap_scene(root, n_views=4)
    scene = dataset.load_scene(root)
    cfg = Config(opt=OptimizationConfig(
        iterations=40, start_ins_feat_iter=10, start_root_cb_iter=100,
        start_leaf_cb_iter=200, densify_from_iter=1000,
        enable_multiview_sam_refinement=True, sam_level=3,
    ))
    tr = Trainer(scene, cfg, str(tmp_path / "out"),
                 rcfg=RasterizeConfig(max_per_tile=64, chunk=32, min_intersections=4096))
    before = np.asarray(tr.bundle.sam_ids).copy()
    tr.train(until=15, log_every=100)
    after = np.asarray(tr.bundle.sam_ids)
    assert after.min() >= 0
    assert not np.array_equal(before, after)  # refinement rewrote the ids
    # training continues through stage 1 on the refined masks
    tr.train(until=20, log_every=100)
    assert np.isfinite(float(tr.history[-1]["loss"])) if tr.history else True


def test_refiner_hook_under_mesh(tmp_path):
    """The one-shot refinement must run (with a single up-front gather)
    when the trainer is mesh-sharded, and training must continue sharded on
    the refined masks."""
    from opengaussian_tpu.parallel.mesh import make_mesh

    root = str(tmp_path / "scene")
    make_colmap_scene(root, n_views=4)
    scene = dataset.load_scene(root)
    cfg = Config(opt=OptimizationConfig(
        iterations=40, start_ins_feat_iter=10, start_root_cb_iter=100,
        start_leaf_cb_iter=200, densify_from_iter=1000,
        enable_multiview_sam_refinement=True, sam_level=3,
    ))
    tr = Trainer(scene, cfg, str(tmp_path / "out"),
                 rcfg=RasterizeConfig(max_per_tile=64, chunk=32,
                                      min_intersections=4096),
                 mesh=make_mesh(8))
    before = np.asarray(tr.bundle.sam_ids).copy()
    tr.train(until=15, log_every=100)
    after = np.asarray(tr.bundle.sam_ids)
    assert not np.array_equal(before, after)
    # state is still sharded across the mesh after the refinement pass
    assert len(tr.state.means.sharding.device_set) == 8
