"""FrozenPlan parity: cached-binning rasterize vs the full binning chain.

The frozen path (ops/rasterize.build_frozen_plan) must be EXACT, not
approximate: same sorted stream -> same blend -> identical images and
gradients; the cached-permutation backward reduction sums the same rows in
a different order (float association only). Three pins:

  1. plan-vs-fresh parity at the plan's own covariance;
  2. plan built at rescale 1.0 serving a SMALLER covariance (the trainer's
     random rescale_factor in stages 2.x): exact because the plan's pair
     list is a superset and the extra pairs hit the alpha < 1/255 rule-1
     skip (ops/blend.py:60) — the same cutoff the reference CUDA blend
     applies in-kernel;
  3. the windowed (tile_windows > 0) configuration.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.ops.projection import build_cov3d
from opengaussian_tpu.ops.rasterize import (
    RasterizeConfig, build_frozen_plan, rasterize,
)


def _scene(n=500, seed=0):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(np.stack([
        rng.normal(0, 0.6, n), rng.normal(0, 0.45, n), rng.uniform(2, 6, n),
    ], -1).astype(np.float32))
    scales = jnp.asarray(
        np.exp(rng.normal(np.log(0.13), 0.3, (n, 3))).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opac = jnp.asarray(
        jax.nn.sigmoid(rng.normal(0.5, 1.5, n)).astype(np.float32))
    payload = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 1.0, 0.8, 96, 80)
    return means, scales, quats, opac, payload, cam


def _cfgs():
    base = RasterizeConfig(max_per_tile=128, chunk=32, backend="pallas",
                           min_intersections=4096)
    return [
        pytest.param(base, id="stream"),
        pytest.param(
            dataclasses.replace(base, max_per_tile=64, tile_windows=3),
            id="windowed"),
    ]


def _loss_outputs(cam, means, cov, opac, payload, cfg, frozen=None):
    def f(payload, opac):
        out = rasterize(cam, means, cov, opac, payload, jnp.zeros(3), cfg,
                        frozen=frozen)
        w = jnp.arange(out.image.size, dtype=jnp.float32).reshape(
            out.image.shape) * 1e-3
        return (jnp.sum(out.image * w) + jnp.sum(out.alpha) * 0.1
                + jnp.sum(out.depth) * 0.01), out

    (loss, out), grads = jax.value_and_grad(f, argnums=(0, 1),
                                            has_aux=True)(payload, opac)
    return loss, out, grads


@pytest.mark.parametrize("cfg", _cfgs())
def test_frozen_matches_fresh(cfg):
    means, scales, quats, opac, payload, cam = _scene()
    cov = build_cov3d(scales, quats)
    plan = build_frozen_plan(cam, means, cov, opac, cfg)
    l0, o0, g0 = _loss_outputs(cam, means, cov, opac, payload, cfg)
    l1, o1, g1 = _loss_outputs(cam, means, cov, opac, payload, cfg,
                               frozen=plan)
    np.testing.assert_allclose(o1.image, o0.image, atol=1e-5)
    np.testing.assert_allclose(o1.alpha, o0.alpha, atol=1e-5)
    np.testing.assert_allclose(o1.depth, o0.depth, atol=1e-4)
    np.testing.assert_allclose(l1, l0, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=2e-5)
    assert int(o1.n_dropped) == int(o0.n_dropped)
    assert int(o1.n_truncated) == int(o0.n_truncated)


@pytest.mark.parametrize("cfg", _cfgs())
def test_frozen_superset_serves_rescaled_cov(cfg):
    """Plan at rescale 1.0, render at rescale 0.55: the reference's stage-2.x
    random-rescale steps reuse the SAME per-view plan.

    Preconditions and the exactness boundary (FrozenPlan docstring):
      * the plan must be TRUNCATION-FREE — under K-truncation the superset
        window drops deeper slots than a tight rescaled binning would keep
        and images fork arbitrarily (measured 0.52 maxdiff with
        n_truncated=827 on this scene at K=128);
      * where the opacity-aware cutoff is the binding radius the extra
        pairs are exactly rule-1-skipped; where the classic 3-sigma bound
        binds, the plan composites tail pairs (alpha up to o*e^-4.5) that a
        fresh rescaled binning drops — a bounded one-sided deviation on the
        MORE-exact side, pinned here at <= 0.02 image / bounded grads."""
    means, scales, quats, opac, payload, cam = _scene(seed=3)
    cov1 = build_cov3d(scales, quats)
    cfg = dataclasses.replace(
        cfg,
        max_per_tile=cfg.max_per_tile * 4,
        tile_windows=cfg.tile_windows * 4,
    )
    plan = build_frozen_plan(cam, means, cov1, opac, cfg)
    assert int(plan.n_truncated) == 0 and int(plan.n_dropped) == 0, (
        "test scene must not truncate at the plan budgets")
    cov_r = build_cov3d(scales * 0.55, quats)
    l0, o0, g0 = _loss_outputs(cam, means, cov_r, opac, payload, cfg)
    l1, o1, g1 = _loss_outputs(cam, means, cov_r, opac, payload, cfg,
                               frozen=plan)
    img_diff = np.abs(np.asarray(o1.image) - np.asarray(o0.image))
    assert img_diff.max() <= 0.02, img_diff.max()
    assert (img_diff > 1e-5).mean() <= 0.03, (img_diff > 1e-5).mean()
    # gradient deviation stays of the same tail order (normalized)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        assert np.abs(a - b).max() / scale <= 0.02


def test_cluster_render_frozen_matches_scan():
    """Stage-2.2's single-root cluster render over the shared frozen plan
    (masked-opacity blend, rule-1 subsetting) vs the per-group scan
    re-binning — image/silhouette/occur and payload grads must agree."""
    import dataclasses as dc

    from opengaussian_tpu.models.gaussians import create_from_pcd
    from opengaussian_tpu.render import render_clusters

    rng = np.random.default_rng(7)
    n = 600
    pts = np.stack([rng.normal(0, .6, n), rng.normal(0, .45, n),
                    rng.uniform(2, 6, n)], -1).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    gs = create_from_pcd(pts, cols, capacity=n, seed=0)
    gs = dc.replace(gs, log_scales=gs.log_scales + np.log(0.3),
                    ins_feat=jnp.asarray(
                        rng.uniform(-1, 1, (n, 6)).astype(np.float32)))
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 1.0, 0.8, 96, 80)
    cls_ids = jnp.asarray((pts[:, 0] > 0).astype(np.int32))  # 2 clusters
    cfg = RasterizeConfig(max_per_tile=512, chunk=32, backend="pallas",
                          min_intersections=8192)
    cov = build_cov3d(gs.scales, gs.quats)
    plan = build_frozen_plan(cam, gs.means, cov, gs.opacity, cfg)
    assert int(plan.n_truncated) == 0 and int(plan.n_dropped) == 0

    def run(frozen):
        def f(feat):
            g2 = dc.replace(gs, ins_feat=feat)
            out = render_clusters(cam, g2, jnp.zeros(3), cls_ids,
                                  jnp.asarray([1]), cfg, min_points=1,
                                  frozen=frozen)
            return jnp.sum(out.cluster_imgs[0] * 0.01), out

        (loss, out), grad = jax.value_and_grad(f, has_aux=True)(gs.ins_feat)
        return loss, out, grad

    l0, o0, g0 = run(None)
    l1, o1, g1 = run(plan)
    np.testing.assert_allclose(o1.cluster_imgs[0], o0.cluster_imgs[0],
                               atol=1e-5)
    np.testing.assert_allclose(o1.cluster_silhouettes[0],
                               o0.cluster_silhouettes[0], atol=1e-5)
    assert bool(o1.cluster_occur[0]) == bool(o0.cluster_occur[0])
    np.testing.assert_allclose(g1, g0, rtol=1e-5, atol=2e-5)


def test_trainer_stage1_frozen_parity(tmp_path):
    """Trainer with frozen plans vs without: stage 1 runs at rescale 1.0,
    where the plan path is EXACT — ins_feat trajectories must agree to
    jit-fusion rounding. Uses the interpret-mode Pallas backend (the only
    config that builds plans off-TPU)."""
    from opengaussian_tpu.config import Config, ModelConfig, OptimizationConfig
    from opengaussian_tpu.data import dataset as ds
    from opengaussian_tpu.train.loop import Trainer
    from tests.test_data import make_colmap_scene

    root = str(tmp_path / "scene")
    make_colmap_scene(root, n_views=4)
    scene = ds.load_scene(root)
    opt = OptimizationConfig(
        iterations=60, start_ins_feat_iter=10, start_root_cb_iter=60,
        start_leaf_cb_iter=90, densify_from_iter=1000, densify_until_iter=0,
        opacity_reset_interval=10_000, sam_level=3, root_node_num=4,
        leaf_node_num=3, leaf_update_fr=10,
    )
    cfg = Config(model=ModelConfig(), opt=opt)
    rcfg = RasterizeConfig(max_per_tile=128, chunk=32,
                           min_intersections=8192, backend="pallas")

    def run(frozen: bool):
        tr = Trainer(scene, cfg, str(tmp_path / f"out_{frozen}"), rcfg=rcfg,
                     seed=3)
        tr.use_frozen_plans = frozen
        tr.train(until=40, log_every=200)
        if frozen:
            assert tr._frozen_plans is not None and \
                tr._frozen_plans is not False, "plans must have been built"
        return tr

    a = run(True)
    b = run(False)
    np.testing.assert_allclose(
        np.asarray(a.state.ins_feat), np.asarray(b.state.ins_feat),
        atol=2e-5,
    )


def test_frozen_scatter_backend_ignores_plan():
    """reduce_backend='scatter' must run correctly with a plan present
    (plan only accelerates the sorted_mxu reduction)."""
    cfg = RasterizeConfig(max_per_tile=128, chunk=32, backend="pallas",
                          min_intersections=4096, reduce_backend="scatter")
    means, scales, quats, opac, payload, cam = _scene(seed=5)
    cov = build_cov3d(scales, quats)
    plan = build_frozen_plan(cam, means, cov, opac, cfg)
    assert plan.reduce is None  # scatter backend builds no reduce plan
    l0, o0, g0 = _loss_outputs(cam, means, cov, opac, payload, cfg)
    l1, o1, g1 = _loss_outputs(cam, means, cov, opac, payload, cfg,
                               frozen=plan)
    np.testing.assert_allclose(o1.image, o0.image, atol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=2e-5)
