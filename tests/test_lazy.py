"""Lazy scene loading (data/lazy.py) == eager loading, bit-for-bit.

SURVEY §7.2 M6 / VERDICT r3 item 10: in save_memory mode the host should
hold ~one view, not V. These tests pin that the lazy path decodes the SAME
bytes as the eager path (images, alpha rule, SAM stride policy), that the
trainer runs on a lazy bundle, and that full-stack materialization (the
stage-boundary escape hatch) round-trips.
"""

import os

import numpy as np
import pytest

from opengaussian_tpu.data import dataset
from opengaussian_tpu.data.lazy import LazyArray, LazyStack, is_lazy
from tests.test_data import make_colmap_scene


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lazy_scene"))
    make_colmap_scene(root, n_views=5)
    return root


def test_lazy_views_match_eager(scene_dir):
    eager = dataset.load_scene(scene_dir)
    lazy = dataset.load_scene(scene_dir, lazy=True)
    assert len(lazy.train_views) == len(eager.train_views)
    for ve, vl in zip(eager.train_views, lazy.train_views):
        assert is_lazy(vl.gt_image) and isinstance(vl.gt_image, LazyArray)
        assert vl.gt_image.shape == ve.gt_image.shape
        np.testing.assert_array_equal(np.asarray(vl.gt_image), ve.gt_image)
        assert (vl.gt_alpha_mask is None) == (ve.gt_alpha_mask is None)
        if ve.sam_mask is not None:
            np.testing.assert_array_equal(np.asarray(vl.sam_mask), ve.sam_mask)
        if ve.clip_feats is not None:
            np.testing.assert_array_equal(vl.clip_feats, ve.clip_feats)
        np.testing.assert_allclose(
            np.asarray(vl.camera.R_w2c), np.asarray(ve.camera.R_w2c))


def test_lazy_resolution_policy_matches(scene_dir):
    eager = dataset.load_scene(scene_dir, resolution=2)
    lazy = dataset.load_scene(scene_dir, resolution=2, lazy=True)
    for ve, vl in zip(eager.train_views, lazy.train_views):
        assert vl.gt_image.shape == ve.gt_image.shape
        np.testing.assert_array_equal(np.asarray(vl.sam_mask), ve.sam_mask)
        np.testing.assert_array_equal(np.asarray(vl.gt_image), ve.gt_image)


def test_lazy_bundle_windows_and_materialization(scene_dir):
    from opengaussian_tpu.train.loop import bundle_views, bundle_window

    lazy = dataset.load_scene(scene_dir, lazy=True)
    eager = dataset.load_scene(scene_dir)
    bl = bundle_views(lazy.train_views, sam_level=3, device=False)
    be = bundle_views(eager.train_views, sam_level=3, device=False)
    assert isinstance(bl.gt_images, LazyStack)
    assert bl.max_masks == be.max_masks
    assert bl.num_views == be.num_views
    # one-view window (the save_memory hot loop)
    for i in (0, bl.num_views - 1):
        wl, we = bundle_window(bl, i), bundle_window(be, i)
        np.testing.assert_array_equal(np.asarray(wl.gt_images),
                                      np.asarray(we.gt_images))
        np.testing.assert_array_equal(np.asarray(wl.sam_ids),
                                      np.asarray(we.sam_ids))
        np.testing.assert_array_equal(np.asarray(wl.alpha_masks),
                                      np.asarray(we.alpha_masks))
    # full-stack escape hatch (pseudo sweeps / refiner)
    np.testing.assert_array_equal(np.asarray(bl.sam_ids),
                                  np.asarray(be.sam_ids))
    # lazy bundles refuse the device-resident mode
    with pytest.raises(AssertionError):
        bundle_views(lazy.train_views, sam_level=3, device=True)


@pytest.mark.slow
def test_trainer_on_lazy_scene_matches_eager(scene_dir, tmp_path):
    import dataclasses

    from opengaussian_tpu.config import Config, ModelConfig, OptimizationConfig
    from opengaussian_tpu.ops.rasterize import RasterizeConfig
    from opengaussian_tpu.train.loop import Trainer

    ocfg = OptimizationConfig(
        iterations=12, start_ins_feat_iter=6, start_root_cb_iter=10 ** 6,
        start_leaf_cb_iter=10 ** 6, densify_from_iter=10 ** 6,
        densify_until_iter=0, save_memory=True, sam_level=3,
    )
    rcfg = RasterizeConfig(max_per_tile=128, chunk=32, min_intersections=8192)

    def run(scene, out):
        tr = Trainer(scene, Config(model=ModelConfig(), opt=ocfg), str(out),
                     rcfg=rcfg, autotune_budgets=False)
        tr.train(until=12, log_every=4)
        return [h["loss"] for h in tr.history]

    l_eager = run(dataset.load_scene(scene_dir), tmp_path / "eager")
    l_lazy = run(dataset.load_scene(scene_dir, lazy=True), tmp_path / "lazy")
    np.testing.assert_allclose(l_lazy, l_eager, rtol=1e-6)
