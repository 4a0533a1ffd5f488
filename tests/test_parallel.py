import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.config import OptimizationConfig
from opengaussian_tpu.models import gaussians as G
from opengaussian_tpu.models import optimizer as opt_mod
from opengaussian_tpu.ops.projection import build_cov3d
from opengaussian_tpu.ops.rasterize import RasterizeConfig, rasterize
from opengaussian_tpu.parallel.mesh import make_mesh, replicate, shard_gaussians
from opengaussian_tpu.parallel.render import make_sharded_train_step, render_sharded
from tests.test_rasterize import make_cam, random_scene

CFG = RasterizeConfig(max_per_tile=256, chunk=32, min_intersections=16384)


def test_sharded_render_matches_single_device():
    assert jax.device_count() == 8
    mesh = make_mesh(8)
    cam = make_cam(80, 64)
    means, scales, quats, op, cols = random_scene(256, seed=0)
    cov = build_cov3d(scales, quats)
    bg = jnp.array([0.1, 0.2, 0.3])

    ref = rasterize(cam, means, cov, op, cols, bg, CFG)

    sh_means, sh_cov, sh_op, sh_cols = shard_gaussians(mesh, (means, cov, op, cols))
    img, alpha, depth, radii, n_lost = jax.jit(
        lambda m, c, o, p: render_sharded(mesh, cam, m, c, o, p, bg, CFG)
    )(sh_means, sh_cov, sh_op, sh_cols)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref.image), atol=3e-5)
    np.testing.assert_allclose(np.asarray(alpha), np.asarray(ref.alpha), atol=3e-5)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(ref.depth), atol=3e-4)
    np.testing.assert_array_equal(np.asarray(radii), np.asarray(ref.radii))
    assert int(n_lost) == 0


def test_sharded_gradients_match_single_device():
    mesh = make_mesh(8)
    cam = make_cam(48, 32)
    means, scales, quats, op, cols = random_scene(128, seed=1)
    bg = jnp.zeros(3)
    target = jnp.asarray(np.random.default_rng(0).uniform(size=(32, 48, 3)).astype(np.float32))

    def loss_single(means, cols):
        out = rasterize(cam, means, build_cov3d(scales, quats), op, cols, bg, CFG)
        return jnp.sum((out.image - target) ** 2)

    def loss_sharded(means, cols):
        img, *_ = render_sharded(
            mesh, cam, means, build_cov3d(scales, quats), op, cols, bg, CFG
        )
        return jnp.sum((img - target) ** 2)

    g_ref = jax.grad(loss_single, argnums=(0, 1))(means, cols)
    sh_means, sh_cols = shard_gaussians(mesh, (means, cols))
    g_sh = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(sh_means, sh_cols)
    for a, b in zip(g_ref, g_sh):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_sharded_train_step_runs_and_learns():
    mesh = make_mesh(8)
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 0.9, 0.7, 64, 48)
    rng = np.random.default_rng(2)
    pts = np.stack([rng.normal(0, 0.5, 64), rng.normal(0, 0.4, 64),
                    rng.uniform(2.5, 5, 64)], -1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (64, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, capacity=128)
    adam = opt_mod.init(state.params())
    stats = G.DensifyStats.zeros(128)
    state = shard_gaussians(mesh, state)
    adam = opt_mod.AdamState(
        mu=shard_gaussians(mesh, adam.mu), nu=shard_gaussians(mesh, adam.nu),
        count=adam.count,
    )
    gt = jnp.asarray(rng.uniform(0.3, 0.7, (48, 64, 3)).astype(np.float32))

    step = make_sharded_train_step(mesh, cam, CFG, OptimizationConfig(), 1.0)
    losses_seen = []
    for it in range(8):
        state, adam, loss, _ = step(state, adam, stats, gt, jnp.int32(it), jnp.zeros(3))
        losses_seen.append(float(loss))
    assert np.isfinite(losses_seen).all()
    assert losses_seen[-1] < losses_seen[0]
    # params stayed sharded over the mesh
    shd = state.means.sharding
    assert len(shd.device_set) == 8


def _shard_training_state(mesh, state, adam, stats=None):
    state = shard_gaussians(mesh, state)
    adam = opt_mod.AdamState(
        mu=shard_gaussians(mesh, adam.mu), nu=shard_gaussians(mesh, adam.nu),
        count=adam.count,
    )
    if stats is not None:
        stats = shard_gaussians(mesh, stats)
    return state, adam, stats


def _toy_training_state(n=64, cap=128, seed=2):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.normal(0, 0.5, n), rng.normal(0, 0.4, n),
                    rng.uniform(2.5, 5, n)], -1).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, capacity=cap)
    return state, opt_mod.init(state.params()), G.DensifyStats.zeros(cap)


def test_sharded_stage0_updates_stats_and_matches_single_device():
    """The sharded stage-0 step must produce the SAME updated params and
    densify stats as the single-device trainer step (VERDICT r1: stats were
    previously ignored under sharding)."""
    from opengaussian_tpu.parallel.steps import make_sharded_steps
    from opengaussian_tpu.train import loop as tloop

    mesh = make_mesh(8)
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 0.9, 0.7, 64, 48)
    state, adam, stats = _toy_training_state()
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(0.2, 0.8, (48, 64, 3)).astype(np.float32))
    ocfg = OptimizationConfig()

    # single-device reference via the trainer's own step body
    bundle = tloop.ViewBundle(
        R=cam.R_w2c[None], t=cam.t_w2c[None],
        fx=jnp.asarray([cam.fx]), fy=jnp.asarray([cam.fy]),
        cx=jnp.asarray([cam.cx]), cy=jnp.asarray([cam.cy]),
        gt_images=gt[None], alpha_masks=jnp.ones((1, 48, 64)),
        has_alpha=jnp.asarray([False]), sam_ids=jnp.zeros((1, 48, 64), jnp.int32),
        width=64, height=48, max_masks=8,
    )
    s_ref, a_ref, st_ref, loss_ref, _, _ = tloop.stage0_step(
        state, adam, stats, bundle, jnp.int32(0), jnp.int32(1), jnp.zeros(3),
        1.0, CFG, ocfg,
    )

    state2, adam2, stats2 = _toy_training_state()
    state2, adam2, stats2 = _shard_training_state(mesh, state2, adam2, stats2)
    steps = make_sharded_steps(mesh, CFG, ocfg, 1.0)
    s_sh, a_sh, st_sh, loss_sh, aux = steps.stage0(
        state2, adam2, stats2, cam, gt, None, jnp.int32(1), jnp.zeros(3)
    )
    assert np.isfinite(float(loss_sh))
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s_sh.means), np.asarray(s_ref.means), atol=2e-5
    )
    # densification stats now update under sharding
    np.testing.assert_allclose(
        np.asarray(st_sh.grad_accum), np.asarray(st_ref.grad_accum),
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(st_sh.denom), np.asarray(st_ref.denom)
    )
    assert float(np.asarray(st_sh.denom).max()) > 0  # something was visible
    assert len(s_sh.means.sharding.device_set) == 8


def test_sharded_stage1_matches_single_device():
    from opengaussian_tpu.parallel.steps import make_sharded_steps
    from opengaussian_tpu.train import loop as tloop

    mesh = make_mesh(8)
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 0.9, 0.7, 64, 48)
    state, adam, _ = _toy_training_state(seed=3)
    rng = np.random.default_rng(1)
    sam = jnp.asarray(
        (rng.integers(0, 3, (48, 64))).astype(np.int32)
    )  # 2 masks + invalid
    ocfg = OptimizationConfig(start_ins_feat_iter=0)

    bundle = tloop.ViewBundle(
        R=cam.R_w2c[None], t=cam.t_w2c[None],
        fx=jnp.asarray([cam.fx]), fy=jnp.asarray([cam.fy]),
        cx=jnp.asarray([cam.cx]), cy=jnp.asarray([cam.cy]),
        gt_images=jnp.zeros((1, 48, 64, 3)), alpha_masks=jnp.ones((1, 48, 64)),
        has_alpha=jnp.asarray([False]), sam_ids=sam[None],
        width=64, height=48, max_masks=8,
    )
    means0 = np.asarray(state.means).copy()  # stage1_step donates `state`
    s_ref, a_ref, loss_ref, _ = tloop.stage1_step(
        state, adam, bundle, jnp.int32(0), jnp.int32(5), jnp.zeros(3),
        jnp.float32(1.0), CFG, ocfg,
    )

    state2, adam2, _ = _toy_training_state(seed=3)
    state2, adam2, _ = _shard_training_state(mesh, state2, adam2)
    steps = make_sharded_steps(mesh, CFG, ocfg, 1.0)
    s_sh, a_sh, loss_sh, _ = steps.stage1(
        state2, adam2, cam, sam, None, jnp.int32(5), jnp.zeros(3),
        jnp.float32(1.0), max_masks=8,
    )
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s_sh.ins_feat), np.asarray(s_ref.ins_feat), atol=2e-5
    )
    # geometry stayed frozen
    np.testing.assert_array_equal(np.asarray(s_sh.means), means0)


def test_sharded_stage2_codebook_steps_run_and_learn():
    from opengaussian_tpu.ops import kmeans as km
    from opengaussian_tpu.parallel.steps import make_sharded_steps

    mesh = make_mesh(8)
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 0.9, 0.7, 64, 48)
    state, adam, _ = _toy_training_state(seed=4)
    ocfg = OptimizationConfig(
        start_ins_feat_iter=0, start_root_cb_iter=0, start_leaf_cb_iter=10,
        root_node_num=4, leaf_node_num=3,
    )
    kms = km.KMeansState.create(state.capacity, 4, 3)
    kms = km.assign_root(
        kms, state.ins_feat, state.means, state.alive, 1.0,
        jax.random.PRNGKey(0), init=True,
    )
    state, adam, _ = _shard_training_state(mesh, state, adam)
    steps = make_sharded_steps(mesh, CFG, ocfg, 1.0)
    pseudo = jnp.full((48, 64, 6), 0.5)

    losses_21 = []
    for it in range(1, 4):
        state, adam, loss, _ = steps.stage21(
            state, adam, kms, cam, pseudo, None, jnp.int32(it), jnp.zeros(3),
            jnp.float32(1.0),
        )
        losses_21.append(float(loss))
    assert np.isfinite(losses_21).all()
    assert losses_21[-1] <= losses_21[0]

    kms = km.assign_leaf(
        kms, jnp.asarray(np.asarray(state.ins_feat)), state.alive,
        jnp.int32(0), jax.random.PRNGKey(1), k2=3, init=True,
    )
    state, adam, loss, ok, _ = steps.stage22(
        state, adam, kms, cam, pseudo, jnp.int32(0), jnp.bool_(True),
        None, jnp.int32(12), jnp.zeros(3), jnp.float32(1.0),
    )
    assert np.isfinite(float(loss))
    assert len(state.means.sharding.device_set) == 8


def test_trainer_mesh_runs_all_stages(tmp_path):
    """Trainer(mesh=...) routes every stage through parallel/steps and stays
    sharded across densify events (the --mesh N CLI path)."""
    from opengaussian_tpu.config import Config, ModelConfig, OptimizationConfig
    from opengaussian_tpu.data import dataset
    from opengaussian_tpu.train.loop import Trainer
    from tests.test_data import make_colmap_scene

    root = str(tmp_path / "scene")
    make_colmap_scene(root, n_views=4)
    scene = dataset.load_scene(root)
    tiny = OptimizationConfig(
        iterations=48, start_ins_feat_iter=12, start_root_cb_iter=24,
        start_leaf_cb_iter=36, densify_from_iter=2, densify_until_iter=10,
        densification_interval=4, opacity_reset_interval=1000,
        root_node_num=4, leaf_node_num=3, leaf_update_fr=6, sam_level=3,
    )
    mesh = make_mesh(8)
    tr = Trainer(
        scene, Config(model=ModelConfig(), opt=tiny), str(tmp_path / "out"),
        rcfg=RasterizeConfig(max_per_tile=128, chunk=32, min_intersections=8192),
        mesh=mesh, autotune_budgets=False,
    )
    tr.train(until=48, log_every=12)
    assert tr.iteration == 48
    assert len(tr.state.means.sharding.device_set) == 8
    assert all(np.isfinite(h["loss"]) for h in tr.history)
    stages = {h["stage"] for h in tr.history}
    assert {"0", "1", "2.1", "2.2"} <= stages


def _blob_scene(n=960, seed=5):
    rng = np.random.default_rng(seed)
    xyz = np.zeros((n, 3), np.float32)
    feat = np.zeros((n, 6), np.float32)
    blob_feats = np.eye(3, 6, dtype=np.float32) * 2.0
    per = n // 3
    for b in range(3):
        sl = slice(b * per, (b + 1) * per)
        xyz[sl] = rng.normal(0, 0.05, (per, 3)) + np.array([b * 3.0, 0, 4.0])
        feat[sl] = blob_feats[b] + rng.normal(0, 0.03, (per, 6))
    true = np.repeat([0, 1, 2], per)
    return feat, xyz, true


def test_sharded_kmeans_root_matches_quality_and_stays_sharded():
    from opengaussian_tpu.ops import kmeans as km
    from opengaussian_tpu.parallel import kmeans as pkm

    mesh = make_mesh(8)
    feat, xyz, true = _blob_scene()
    n = feat.shape[0]
    alive = np.ones(n, bool)
    st = km.KMeansState.create(n, 3, 2)
    sh_feat, sh_xyz, sh_alive = shard_gaussians(mesh, (jnp.asarray(feat), jnp.asarray(xyz), jnp.asarray(alive)))

    st = pkm.assign_root_sharded(mesh, st, sh_feat, sh_xyz, sh_alive, 1.0,
                                 jax.random.PRNGKey(0), init=True)
    ids = np.asarray(st.cls_ids)
    assert len(st.cls_ids.sharding.device_set) == 8  # assignment stayed sharded
    per = n // 3
    used = set()
    for b in range(3):
        h = np.bincount(ids[true == b], minlength=3)
        root = int(h.argmax())
        assert h[root] >= int(per * 0.9), h
        used.add(root)
    assert len(used) == 3


def test_sharded_kmeans_reassign_aligns_labels_to_cache():
    """Reassign from good cached centers must keep the SAME root labels
    (restart or not), since downstream state is keyed by root id."""
    from opengaussian_tpu.ops import kmeans as km
    from opengaussian_tpu.parallel import kmeans as pkm

    mesh = make_mesh(8)
    feat, xyz, true = _blob_scene(seed=6)
    n = feat.shape[0]
    alive = np.ones(n, bool)
    cat = np.concatenate([feat, xyz], axis=1)
    per = n // 3
    cached = np.stack([cat[true == b].mean(0) for b in (2, 0, 1)]).astype(np.float32)
    st = km.KMeansState.create(n, 3, 2)._replace(centers=jnp.asarray(cached))
    sh = shard_gaussians(mesh, (jnp.asarray(feat), jnp.asarray(xyz), jnp.asarray(alive)))

    st = pkm.assign_root_sharded(mesh, st, *sh, 1.0, jax.random.PRNGKey(1), init=False)
    ids = np.asarray(st.cls_ids)
    # cached label layout: blob 2 -> 0, blob 0 -> 1, blob 1 -> 2
    want = {2: 0, 0: 1, 1: 2}
    for b, lab in want.items():
        h = np.bincount(ids[true == b], minlength=3)
        assert int(h.argmax()) == lab, (b, h)
        assert h[lab] >= int(per * 0.9), h
    # centers converged to the blob means under the cached labeling
    got = np.asarray(st.centers)
    np.testing.assert_allclose(got, cached, atol=0.05)


def test_sharded_kmeans_leaf_matches_single_device_semantics():
    from opengaussian_tpu.ops import kmeans as km
    from opengaussian_tpu.parallel import kmeans as pkm

    mesh = make_mesh(8)
    rng = np.random.default_rng(7)
    n, k2 = 512, 4
    feat = np.zeros((n, 6), np.float32)
    # root 0 points = first half, two sub-blobs; root 1 = second half
    feat[: n // 4] = np.array([1, 0, 0, 0, 0, 0], np.float32) + rng.normal(0, 0.02, (n // 4, 6))
    feat[n // 4 : n // 2] = np.array([0, 1, 0, 0, 0, 0], np.float32) + rng.normal(0, 0.02, (n // 4, 6))
    feat[n // 2 :] = np.array([0, 0, 3, 0, 0, 0], np.float32) + rng.normal(0, 0.02, (n // 2, 6))
    alive = np.ones(n, bool)
    cls_ids = np.where(np.arange(n) < n // 2, 0, 1).astype(np.int32)

    st = km.KMeansState.create(n, 2, k2)._replace(
        cls_ids=jnp.asarray(cls_ids),
        leaf_sub_num=jnp.asarray([2, 1], jnp.int32),  # root 0: 2 active leaves
    )
    sh_feat, sh_alive, sh_cls = shard_gaussians(
        mesh, (jnp.asarray(feat), jnp.asarray(alive), jnp.asarray(cls_ids)))
    st_sh = st._replace(cls_ids=sh_cls)
    st_sh = pkm.assign_leaf_sharded(mesh, st_sh, sh_feat, sh_alive, 0,
                                    jax.random.PRNGKey(2), k2, init=True)
    leaf_ids = np.asarray(st_sh.leaf_cls_ids)
    # root-1 points untouched (still in the unassigned bucket)
    assert (leaf_ids[n // 2 :] == 2 * k2).all()
    # root-0 sub-blobs split into exactly the 2 active slots {0, 1}
    a, b = leaf_ids[: n // 4], leaf_ids[n // 4 : n // 2]
    assert set(np.unique(a)) | set(np.unique(b)) <= {0, 1}
    assert np.unique(a).size == 1 and np.unique(b).size == 1
    assert a[0] != b[0]


def test_scaling_bench_virtual_mesh():
    """The 1->N scaling harness runs on the virtual CPU mesh and reports
    sane numbers (BASELINE.md north star: 1 chip -> 1 host -> N hosts)."""
    from opengaussian_tpu.parallel.distributed import (
        init_distributed,
        scaling_bench,
    )

    assert init_distributed() is False  # single-process: no-op
    rows = scaling_bench(sizes=[1, 2], width=64, height=48, n_gauss=256,
                         iters=2)
    assert [r["devices"] for r in rows] == [1, 2]
    for r in rows:
        assert r["ms_per_step"] > 0 and np.isfinite(r["mpix_s"])
    assert rows[0]["efficiency"] == 1.0


def test_sharded_alpha_mask_gating():
    """Maskless views (has_alpha=False) must contribute NO alpha-mask loss
    even when the all-ones placeholder is passed; masked views must."""
    from opengaussian_tpu.parallel.steps import make_sharded_steps

    mesh = make_mesh(8)
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 0.9, 0.7, 64, 48)
    state, adam, stats = _toy_training_state(seed=6)
    state, adam, stats = _shard_training_state(mesh, state, adam, stats)
    rng = np.random.default_rng(3)
    gt = jnp.asarray(rng.uniform(0.2, 0.8, (48, 64, 3)).astype(np.float32))
    ones_mask = jnp.ones((48, 64))
    steps = make_sharded_steps(mesh, CFG, OptimizationConfig(), 1.0)

    _, _, _, loss_none, _ = steps.stage0(
        state, adam, stats, cam, gt, None, jnp.int32(1), jnp.zeros(3)
    )
    _, _, _, loss_gated, _ = steps.stage0(
        state, adam, stats, cam, gt, ones_mask, jnp.int32(1), jnp.zeros(3),
        jnp.bool_(False),
    )
    _, _, _, loss_masked, _ = steps.stage0(
        state, adam, stats, cam, gt, ones_mask, jnp.int32(1), jnp.zeros(3),
        jnp.bool_(True),
    )
    np.testing.assert_allclose(float(loss_gated), float(loss_none), rtol=1e-6)
    assert float(loss_masked) > float(loss_none)  # alpha < 1 somewhere

    # stage 1 carries the alpha term too (was silently dropped under --mesh)
    sam = jnp.asarray(rng.integers(0, 3, (48, 64)).astype(np.int32))
    ocfg1 = OptimizationConfig(start_ins_feat_iter=0)
    steps1 = make_sharded_steps(mesh, CFG, ocfg1, 1.0)
    _, _, l1_none, _ = steps1.stage1(
        state, adam, cam, sam, None, jnp.int32(5), jnp.zeros(3),
        jnp.float32(1.0), max_masks=8,
    )
    _, _, l1_mask, _ = steps1.stage1(
        state, adam, cam, sam, ones_mask, jnp.int32(5), jnp.zeros(3),
        jnp.float32(1.0), max_masks=8, has_alpha=jnp.bool_(True),
    )
    assert float(l1_mask) > float(l1_none)


def test_sharded_gradients_pallas_compact_layout():
    """The stream kernels inside shard_map with the compact backward layout
    (interpret mode on CPU; semantics-level pin for the on-chip path)."""
    import dataclasses

    cfg = dataclasses.replace(CFG, backend="pallas", bwd_layout="compact",
                              max_per_tile=64, min_intersections=8192)
    mesh = make_mesh(8)
    cam = make_cam(32, 32)
    means, scales, quats, op, cols = random_scene(96, seed=6)
    bg = jnp.zeros(3)
    target = jnp.asarray(
        np.random.default_rng(6).uniform(size=(32, 32, 3)).astype(np.float32)
    )

    def loss_single(means, cols):
        out = rasterize(cam, means, build_cov3d(scales, quats), op, cols, bg,
                        dataclasses.replace(cfg, backend="xla"))
        return jnp.sum((out.image - target) ** 2)

    def loss_sharded(means, cols):
        img, *_ = render_sharded(
            mesh, cam, means, build_cov3d(scales, quats), op, cols, bg, cfg
        )
        return jnp.sum((img - target) ** 2)

    g_ref = jax.grad(loss_single, argnums=(0, 1))(means, cols)
    sh_means, sh_cols = shard_gaussians(mesh, (means, cols))
    g_sh = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(sh_means, sh_cols)
    for a, b in zip(g_ref, g_sh):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)
