"""Mesh-sharded preprocessing sweeps == single-device sweeps (VERDICT r2
item 2: stage-boundary sweeps must not gather the sharded state).

Each test compares parallel/sweeps.make_sweep_fns against the jitted
single-device functions in train/pseudo.py / train/lang.py on the aligned
two-blob scene, and asserts the heavy inputs stay device-sharded.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opengaussian_tpu.ops.rasterize import RasterizeConfig
from opengaussian_tpu.parallel.mesh import make_mesh, shard_gaussians
from opengaussian_tpu.parallel.sweeps import make_sweep_fns
from opengaussian_tpu.train import lang as lang_mod
from opengaussian_tpu.train import pseudo as pseudo_mod
from tests.test_pseudo_sweep2 import RCFG

pytestmark = pytest.mark.slow

K1, K2, MAX_MASKS = 2, 3, 8


def aligned_scene_padded():
    """tests.test_pseudo_sweep2.aligned_scene with a mesh-divisible capacity
    (320 = 8 devices x 40) — the 20 pad slots are dead (alive=False)."""
    from opengaussian_tpu.cameras import Camera
    from opengaussian_tpu.models.gaussians import create_from_pcd
    from opengaussian_tpu.render import render

    rng = np.random.default_rng(0)
    n, cap = 300, 320
    pts = np.concatenate([
        rng.normal(0, 0.08, (150, 3)) + np.array([-0.5, 0, 3.0]),
        rng.normal(0, 0.08, (150, 3)) + np.array([0.5, 0, 3.0]),
    ]).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
    gs = create_from_pcd(pts, cols, capacity=cap, seed=0)
    feat = np.concatenate([
        np.tile([0.9, -0.9, 0.9, -0.9, 0.9, -0.9], (150, 1)),
        np.tile([-0.9, 0.9, -0.9, 0.9, -0.9, 0.9], (150, 1)),
        np.zeros((cap - n, 6)),
    ]).astype(np.float32)
    gs = dataclasses.replace(
        gs,
        log_scales=jnp.full_like(gs.log_scales, np.log(0.05)),
        logit_opacity=jnp.where(gs.alive, 4.0, -10.0),
        ins_feat=jnp.asarray(feat),
    )
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 1.0, 0.8, 160, 120)
    cls_ids = jnp.asarray(
        np.array([0] * 150 + [1] * 150 + [K1] * (cap - n), np.int32)
    )
    out = render(cam, gs, jnp.zeros(3), 3, RCFG, render_color=False,
                 render_feat_map=True, origin_feat=True, rescale_factor=1.0)
    sil = np.asarray(out.silhouette)
    sam = np.zeros((120, 160), np.int32)
    sam[:, :80] = 1
    sam[:, 80:] = 2
    sam = np.where(sil > 0.5, sam, 0)
    return gs, cam, cls_ids, sam


@pytest.fixture(scope="module")
def scene():
    gs, cam, cls_ids, sam = aligned_scene_padded()
    mesh = make_mesh(8)
    gs_sh = shard_gaussians(mesh, gs)
    cls_sh = shard_gaussians(mesh, cls_ids)
    fns = make_sweep_fns(mesh, RCFG, K1, K2, MAX_MASKS)
    return gs, gs_sh, cam, cls_ids, cls_sh, jnp.asarray(sam), fns


def test_sweep1_sharded_matches_single(scene):
    gs, gs_sh, cam, _, _, sam, fns = scene
    bg = jnp.zeros(3)
    f_ref, m_ref = pseudo_mod._sweep1_view(gs, cam, sam, bg, MAX_MASKS, RCFG)
    f_sh, m_sh = fns.sweep1(gs_sh, cam, sam, bg)
    np.testing.assert_allclose(np.asarray(f_sh), np.asarray(f_ref), atol=3e-5)
    np.testing.assert_array_equal(np.asarray(m_sh), np.asarray(m_ref))
    # heavy input stayed sharded through the call
    assert len(gs_sh.means.sharding.device_set) == 8


def test_sweep2_sharded_matches_single(scene):
    gs, gs_sh, cam, cls_ids, cls_sh, sam, fns = scene
    bg = jnp.zeros(3)
    pf, pids = pseudo_mod._sweep1_view(gs, cam, sam, bg, MAX_MASKS, RCFG)
    c_ref, o_ref = pseudo_mod._sweep2_view(
        gs, cam, pf, pids, cls_ids, bg, MAX_MASKS, K1, RCFG
    )
    c_sh, o_sh = fns.sweep2(gs_sh, cam, pf, pids, cls_sh, bg)
    np.testing.assert_array_equal(np.asarray(o_sh), np.asarray(o_ref))
    np.testing.assert_array_equal(np.asarray(c_sh), np.asarray(c_ref))
    assert np.asarray(o_ref).all()  # the aligned scene must actually match


def test_lang_view_sharded_matches_single(scene):
    gs, gs_sh, cam, cls_ids, cls_sh, sam, fns = scene
    bg = jnp.zeros(3)
    # leaf ids: split each blob in half -> leaves {0,1} of root 0, {3,4} of 1
    leaf = np.full(gs.capacity, K1 * K2, np.int32)  # pad -> unassigned bucket
    leaf[:75], leaf[75:150] = 0, 1
    leaf[150:225], leaf[225:300] = K2 + 0, K2 + 1
    leaf_ids = jnp.asarray(leaf)
    pf, pids = pseudo_mod._sweep1_view(gs, cam, sam, bg, MAX_MASKS, RCFG)
    occur = jnp.ones((K1,), bool)
    mid_ref, sc_ref, ok_ref = lang_mod._associate_view(
        gs, leaf_ids, cam, pf, pids, occur, bg, K1, K2, MAX_MASKS, RCFG
    )
    mid_sh, sc_sh, ok_sh = fns.lang_view(
        gs_sh, shard_gaussians(make_mesh(8), leaf_ids), cam, pf, pids,
        occur, bg,
    )
    np.testing.assert_array_equal(np.asarray(ok_sh), np.asarray(ok_ref))
    np.testing.assert_array_equal(np.asarray(mid_sh), np.asarray(mid_ref))
    np.testing.assert_allclose(np.asarray(sc_sh), np.asarray(sc_ref),
                               atol=1e-4)
    assert np.asarray(ok_ref).any()


def test_construct_pseudo_labels_with_sharded_fns(scene):
    """End-to-end: construct_pseudo_labels(sweep_fns=sharded) == default."""
    gs, gs_sh, cam, cls_ids, cls_sh, sam, fns = scene
    ref = pseudo_mod.construct_pseudo_labels(
        gs, [cam], sam[None], jnp.zeros(3), MAX_MASKS, RCFG,
        mode="leaf", cls_ids=cls_ids, k1=K1, k2=K2,
    )
    got = pseudo_mod.construct_pseudo_labels(
        gs_sh, [cam], sam[None], jnp.zeros(3), MAX_MASKS, RCFG,
        mode="leaf", cls_ids=cls_sh, k1=K1, k2=K2, sweep_fns=fns,
    )
    np.testing.assert_array_equal(np.asarray(got.mask_ids),
                                  np.asarray(ref.mask_ids))
    np.testing.assert_allclose(np.asarray(got.feat), np.asarray(ref.feat),
                               atol=3e-5)
    np.testing.assert_array_equal(np.asarray(got.cluster_occur),
                                  np.asarray(ref.cluster_occur))
    np.testing.assert_array_equal(np.asarray(got.leaf_sub_num),
                                  np.asarray(ref.leaf_sub_num))


def test_budget_probe_sharded_matches_single(scene):
    from opengaussian_tpu.ops import budget

    gs, gs_sh, cam, *_ = scene
    t_ref, c_ref = budget.probe(gs, [cam])
    t_sh, c_sh = budget.probe(gs_sh, [cam], mesh=make_mesh(8))
    assert t_sh == t_ref
    # the sharded probe bins each device's own splats (same circle-tile
    # cull) and psums the per-tile counts — exactly the single-device probe
    assert c_sh == c_ref


def test_trainer_mesh_routes_sweeps_sharded(tmp_path):
    """Trainer(mesh=...) builds the sharded sweep fns and completes the
    pseudo-label boundary + stage 3 without gathering (smoke + wiring)."""
    from opengaussian_tpu.config import Config, ModelConfig, OptimizationConfig
    from opengaussian_tpu.data import dataset
    from opengaussian_tpu.train.loop import Trainer
    from tests.test_data import make_colmap_scene

    root = str(tmp_path / "scene")
    make_colmap_scene(root, n_views=4)
    scene = dataset.load_scene(root)
    tiny = OptimizationConfig(
        iterations=40, start_ins_feat_iter=10, start_root_cb_iter=20,
        start_leaf_cb_iter=30, densify_from_iter=2, densify_until_iter=8,
        densification_interval=4, opacity_reset_interval=1000,
        root_node_num=4, leaf_node_num=3, leaf_update_fr=5, sam_level=3,
    )
    mesh = make_mesh(8)
    tr = Trainer(
        scene, Config(model=ModelConfig(), opt=tiny), str(tmp_path / "out"),
        rcfg=RasterizeConfig(max_per_tile=128, chunk=32,
                             min_intersections=8192),
        mesh=mesh, autotune_budgets=False,
    )
    tr.train(until=40, log_every=10)
    assert tr._psweeps is not None  # the sharded sweep fns were built + used
    res = tr.run_stage3()
    assert "cluster_lang" in res or isinstance(res, dict)
    assert len(tr.state.means.sharding.device_set) == 8


def _walk_eqns(jaxpr):
    """Yield (eqn, path) over a jaxpr and all nested sub-jaxprs."""
    for eqn in jaxpr.eqns:
        yield eqn
        for v in eqn.params.values():
            inner = getattr(v, "jaxpr", None)
            if inner is not None and hasattr(inner, "eqns"):
                yield from _walk_eqns(inner)
            elif hasattr(v, "eqns"):
                yield from _walk_eqns(v)


def test_lang_view_scan_body_has_no_per_splat_collectives(scene):
    """VERDICT r3 item 5: the stage-3 root scan must not re-gather the
    projected table per root. Structural check on the jaxpr: inside any
    `scan`, every all_gather operand must be tile-sized (leading dim == k2
    group count), never per-splat (capacity or capacity/8)."""
    import jax

    gs, gs_sh, cam, cls_ids, cls_sh, sam, fns = scene
    bg = jnp.zeros(3)
    leaf = np.full(gs.capacity, K1 * K2, np.int32)
    leaf_ids = jnp.asarray(leaf)
    pf, pids = pseudo_mod._sweep1_view(gs, cam, sam, bg, MAX_MASKS, RCFG)
    occur = jnp.ones((K1,), bool)
    closed = jax.make_jaxpr(fns.lang_view)(
        gs_sh, shard_gaussians(make_mesh(8), leaf_ids), cam, pf, pids,
        occur, bg,
    )
    cap = gs.capacity
    splat_dims = {cap, cap // 8}

    def scan_bodies(jaxpr):
        for eqn in jaxpr.eqns:
            subs = [
                v for v in eqn.params.values()
                if hasattr(getattr(v, "jaxpr", v), "eqns")
            ]
            if eqn.primitive.name == "scan":
                yield from subs
            for s in subs:
                yield from scan_bodies(getattr(s, "jaxpr", s))

    n_scans = 0
    for body in scan_bodies(closed.jaxpr):
        n_scans += 1
        for eqn in _walk_eqns(getattr(body, "jaxpr", body)):
            if "all_gather" in eqn.primitive.name:
                for invar in eqn.invars:
                    shape = getattr(invar.aval, "shape", ())
                    assert not (shape and shape[0] in splat_dims), (
                        f"per-splat all_gather inside root scan: {shape}"
                    )
    assert n_scans >= 1  # the root scan itself must exist
