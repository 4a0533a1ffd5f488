"""Budget auto-tuning (ops/budget.py)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.models.gaussians import create_from_pcd
from opengaussian_tpu.ops import budget
from opengaussian_tpu.ops.rasterize import RasterizeConfig, rasterize
from opengaussian_tpu.ops.projection import build_cov3d


def small_scene(n=400):
    rng = np.random.default_rng(3)
    pts = np.stack([rng.normal(0, 0.4, n), rng.normal(0, 0.3, n),
                    rng.uniform(2, 5, n)], -1).astype(np.float32)
    st = create_from_pcd(pts, rng.uniform(0, 1, (n, 3)).astype(np.float32),
                         capacity=n, seed=0)
    return dataclasses.replace(
        st, log_scales=jnp.full_like(st.log_scales, np.log(0.05)),
        logit_opacity=jnp.asarray(rng.normal(0, 1, n).astype(np.float32)),
    )


def test_tuned_config_shrinks_and_stays_exact():
    st = small_scene()
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 0.9, 0.7, 160, 120)
    base = RasterizeConfig(max_per_tile=512, chunk=32, min_intersections=4096)
    tuned = budget.tuned_config(base, st, [cam])
    assert tuned.max_per_tile <= base.max_per_tile
    assert tuned.max_intersections(st.capacity) <= base.max_intersections(st.capacity)
    cov = build_cov3d(st.scales, st.quats)
    pay = jnp.concatenate([st.sh_dc[:, 0], st.ins_feat[:, :0]], axis=-1)
    full = rasterize(cam, st.means, cov, st.opacity, pay, jnp.zeros(3), base)
    tun = rasterize(cam, st.means, cov, st.opacity, pay, jnp.zeros(3), tuned)
    assert int(tun.n_dropped) == 0 and int(tun.n_truncated) == 0
    np.testing.assert_allclose(np.asarray(tun.image), np.asarray(full.image),
                               rtol=1e-6, atol=1e-6)


def test_tuned_config_tight_headroom_still_exact():
    """headroom=1.05 (static-scene / bench fit) must produce budgets <= the
    1.3 default while still rendering the probe view losslessly."""
    st = small_scene()
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 0.9, 0.7, 160, 120)
    base = RasterizeConfig(max_per_tile=512, chunk=32, min_intersections=4096)
    loose = budget.tuned_config(base, st, [cam])
    tight = budget.tuned_config(base, st, [cam], headroom=1.05)
    assert tight.max_per_tile <= loose.max_per_tile
    assert tight.max_intersections(st.capacity) <= loose.max_intersections(
        st.capacity)
    cov = build_cov3d(st.scales, st.quats)
    pay = jnp.concatenate([st.sh_dc[:, 0], st.ins_feat[:, :0]], axis=-1)
    full = rasterize(cam, st.means, cov, st.opacity, pay, jnp.zeros(3), base)
    tun = rasterize(cam, st.means, cov, st.opacity, pay, jnp.zeros(3), tight)
    assert int(tun.n_dropped) == 0 and int(tun.n_truncated) == 0
    np.testing.assert_allclose(np.asarray(tun.image), np.asarray(full.image),
                               rtol=1e-6, atol=1e-6)


def test_stage1_reports_lost_and_trainer_reprobes(tmp_path, capsys):
    """A budget overflow during the FEATURE stages must be detected (VERDICT
    r2 item 6: n_lost was stage-0-only): shrink the budgets mid-stage-1 and
    observe the warning + re-probe."""
    import pytest

    pytest.importorskip("jax")
    import jax

    from opengaussian_tpu.config import Config, ModelConfig, OptimizationConfig
    from opengaussian_tpu.data import dataset
    from opengaussian_tpu.train.loop import Trainer
    from tests.test_data import make_colmap_scene

    root = str(tmp_path / "scene")
    make_colmap_scene(root, n_views=3)
    scene = dataset.load_scene(root)
    tiny = OptimizationConfig(
        iterations=8, start_ins_feat_iter=2, start_root_cb_iter=100,
        start_leaf_cb_iter=200, densify_from_iter=100, densify_until_iter=0,
        root_node_num=4, leaf_node_num=3, sam_level=3,
    )
    tr = Trainer(
        scene, Config(model=ModelConfig(), opt=tiny), str(tmp_path / "out"),
        rcfg=RasterizeConfig(max_per_tile=128, chunk=32,
                             min_intersections=8192),
        autotune_budgets=False,
    )
    tr.train(until=2, log_every=1)  # through stage 0

    # strangle the budgets: every stage-1 render now drops intersections
    tr.rcfg = RasterizeConfig(max_per_tile=16, chunk=16,
                              min_intersections=256, intersection_budget=256)
    tr.autotune_budgets = True
    tr._budgets_tuned = True  # pretend these tiny budgets were "tuned"
    tr.train(until=4, log_every=1)
    out = capsys.readouterr().out
    assert "WARNING" in out and "re-probing" in out
    # the re-probe restored workable budgets: further steps run clean, even
    # where the scene's true need exceeds the base config's per-tile cap
    tr.train(until=6, log_every=1)
    out = capsys.readouterr().out
    assert "WARNING" not in out
    assert tr._budgets_tuned
    assert tr.rcfg.max_intersections(tr.state.capacity) > 256



def test_probe_escalates_past_its_own_cap():
    """A tile with more covers than the starting per-tile probe cap (2048)
    must be measured UNCLAMPED: the probe doubles its cap until the
    measurement saturates nothing, so tuned_config sees the true need."""
    n = 4096
    rng = np.random.default_rng(7)
    # every splat on the same spot -> one tile holds all n covers
    pts = np.stack([rng.normal(0, 1e-4, n), rng.normal(0, 1e-4, n),
                    np.full(n, 3.0)], -1).astype(np.float32)
    st = create_from_pcd(pts, rng.uniform(0, 1, (n, 3)).astype(np.float32),
                         capacity=n, seed=0)
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 1.0, 0.8, 64, 48)
    total, cnt = budget.probe(st, [cam])
    assert cnt > budget.PROBE_K, (cnt, budget.PROBE_K)
    assert cnt == n  # all splats cover the center tile
    # and tuned_config grows max_per_tile past a small base cap
    base = RasterizeConfig(max_per_tile=256, chunk=64, min_intersections=8192)
    tuned = budget.tuned_config(base, st, [cam])
    assert tuned.max_per_tile >= cnt
