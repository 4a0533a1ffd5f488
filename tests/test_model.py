import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.config import OptimizationConfig
from opengaussian_tpu.models import gaussians as G
from opengaussian_tpu.models import optimizer as opt_mod
from opengaussian_tpu.ops.rasterize import RasterizeConfig
from opengaussian_tpu.render import render
from opengaussian_tpu.train import losses

CFG = RasterizeConfig(max_per_tile=256, chunk=32, min_intersections=16384)


def toy_state(n=64, seed=0, cap=None):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.normal(0, 0.5, n), rng.normal(0, 0.4, n), rng.uniform(2.5, 5, n)], -1
    ).astype(np.float32)
    cols = rng.uniform(0.1, 0.9, (n, 3)).astype(np.float32)
    return G.create_from_pcd(pts, cols, sh_degree=3, seed=seed, capacity=cap or G.round_capacity(n, 128))


def test_create_from_pcd():
    st = toy_state(50)
    assert st.capacity == 128
    assert int(st.num_alive) == 50
    np.testing.assert_allclose(np.asarray(st.opacity)[:50], 0.1, rtol=1e-5)
    assert (np.asarray(st.opacity)[50:] == 0).all()
    # scales from knn distances are finite and reasonable
    s = np.asarray(st.scales)[:50]
    assert np.isfinite(s).all() and (s > 0).all()
    # padded quats are valid (identity)
    assert (np.asarray(st.quats)[50:, 0] == 1).all()


def test_adam_matches_torch_formula():
    params = {"x": jnp.asarray([1.0, -2.0])}
    grads = {"x": jnp.asarray([0.5, 0.1])}
    st = opt_mod.init(params)
    new_p, st2 = opt_mod.apply(params, grads, st, {"x": 0.01})
    # first step of torch Adam: p - lr * sign-ish update
    m = 0.1 * np.array([0.5, 0.1])
    v = 0.001 * np.array([0.25, 0.01])
    mhat = m / (1 - 0.9)
    vhat = v / (1 - 0.999)
    expected = np.array([1.0, -2.0]) - 0.01 * mhat / (np.sqrt(vhat) + 1e-15)
    np.testing.assert_allclose(np.asarray(new_p["x"]), expected, rtol=1e-5)
    assert int(st2.count) == 1


def test_lr_schedule_stages():
    oc = OptimizationConfig()
    # lr_delay_steps is never set by the reference, so no warmup: lr_init at 0
    lrs0 = opt_mod.learning_rates(oc, 0, 2.0)
    np.testing.assert_allclose(float(lrs0["means"]), 0.00016 * 2.0, rtol=1e-4)
    lrs_mid = opt_mod.learning_rates(oc, 30_000, 2.0)
    np.testing.assert_allclose(float(lrs_mid["means"]), 0.0000016 * 2.0, rtol=1e-4)
    # stage 1: geometry frozen, ins_feat at 1e-3
    lrs1 = opt_mod.learning_rates(oc, 35_000, 2.0)
    assert float(lrs1["means"]) == 0 and float(lrs1["log_scales"]) == 0
    np.testing.assert_allclose(float(lrs1["ins_feat"]), 1e-3, rtol=1e-5)
    # stage 2.1: ins_feat at 1e-4
    lrs21 = opt_mod.learning_rates(oc, 45_000, 2.0)
    np.testing.assert_allclose(float(lrs21["ins_feat"]), 1e-4, rtol=1e-5)
    # stage 2.2: back to 1e-3
    lrs22 = opt_mod.learning_rates(oc, 55_000, 2.0)
    np.testing.assert_allclose(float(lrs22["ins_feat"]), 1e-3, rtol=1e-5)


def test_densify_clone_and_split():
    st = toy_state(40, cap=256)
    mu = jax.tree.map(jnp.ones_like, st.params())
    nu = jax.tree.map(jnp.ones_like, st.params())
    stats = G.DensifyStats.zeros(256)
    # force: first 10 alive splats hot; make 5 of them large (split), 5 small (clone)
    grad_acc = jnp.zeros(256).at[:10].set(1.0)
    stats = dataclasses.replace(stats, grad_accum=grad_acc, denom=jnp.ones(256))
    logs = st.log_scales
    logs = logs.at[:5].set(jnp.log(2.0))  # large -> split
    logs = logs.at[5:10].set(jnp.log(1e-4))  # small -> clone
    st = dataclasses.replace(st, log_scales=logs)

    n0 = int(st.num_alive)
    st2, (mu2, nu2), stats2, overflow = G.densify_and_prune(
        st, (mu, nu), stats, jax.random.PRNGKey(0),
        max_grad=0.5, min_opacity=0.005, extent=3.0, max_screen_size=0.0,
        percent_dense=0.01,
    )
    assert int(overflow) == 0
    assert int(st2.num_alive) == n0 + 10  # 5 clones + 5 split children
    # split parents got scale / 1.6
    np.testing.assert_allclose(
        np.asarray(st2.scales)[:5], 2.0 / 1.6, rtol=1e-5
    )
    # split parents' moments were reset; clone parents kept theirs
    assert (np.asarray(mu2["means"])[:5] == 0).all()
    assert (np.asarray(mu2["means"])[5:10] == 1).all()
    # stats reset
    assert (np.asarray(stats2.grad_accum) == 0).all()


def test_densify_prune_low_opacity():
    st = toy_state(40, cap=128)
    lo = st.logit_opacity.at[:7].set(G.inverse_sigmoid(jnp.float32(0.001)))
    st = dataclasses.replace(st, logit_opacity=lo)
    z = jax.tree.map(jnp.zeros_like, st.params())
    st2, _, _, _ = G.densify_and_prune(
        st, (z, z), G.DensifyStats.zeros(128), jax.random.PRNGKey(0),
        max_grad=1e9, min_opacity=0.005, extent=3.0, max_screen_size=0.0,
        percent_dense=0.01,
    )
    assert int(st2.num_alive) == 33


def test_reset_opacity():
    st = toy_state(20, cap=128)
    z = jax.tree.map(jnp.zeros_like, st.params())
    mu = jax.tree.map(jnp.ones_like, st.params())
    st2, (mu2, _) = G.reset_opacity(st, (mu, mu))
    assert float(np.asarray(st2.opacity)[:20].max()) <= 0.01 + 1e-6
    assert (np.asarray(mu2["logit_opacity"]) == 0).all()
    assert (np.asarray(mu2["means"]) == 1).all()


def test_toy_training_improves_psnr():
    """End-to-end stage-0 slice: render a GT scene, then fit a perturbed copy
    back with the real loss/optimizer; PSNR must climb substantially."""
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 0.9, 0.7, 64, 48)
    gt_state = toy_state(60, seed=1)
    bg = jnp.zeros(3)
    gt = render(cam, gt_state, bg, 3, CFG).render

    rng = np.random.default_rng(2)
    st = dataclasses.replace(
        gt_state,
        means=gt_state.means + jnp.asarray(rng.normal(0, 0.08, (gt_state.capacity, 3)).astype(np.float32)),
        sh_dc=gt_state.sh_dc + jnp.asarray(rng.normal(0, 0.8, gt_state.sh_dc.shape).astype(np.float32)),
    )
    oc = OptimizationConfig()
    adam = opt_mod.init(st.params())

    @jax.jit
    def step(st, adam, it):
        def loss_fn(params, tap):
            gs = st.with_params(params)
            out = render(cam, gs, bg, 3, CFG, screen_tap=tap)
            return losses.rgb_loss(out.render, gt), out

        tap = jnp.zeros((st.capacity, 2))
        (loss, out), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            st.params(), tap
        )
        lrs = opt_mod.learning_rates(oc, it, 1.0)
        lrs = {k: lrs[k] * 5.0 for k in lrs}  # tiny scene: speed up
        new_p, adam = opt_mod.apply(st.params(), grads[0], adam, lrs)
        return st.with_params(new_p), adam, loss, out.render

    img0 = None
    for it in range(150):
        st, adam, loss, img = step(st, adam, it)
        if it == 0:
            img0 = img
    psnr0 = float(losses.psnr(img0, gt))
    psnr1 = float(losses.psnr(img, gt))
    assert psnr1 > psnr0 + 3.0, (psnr0, psnr1)


def test_kmeans_robust_to_nan_dead_rows():
    """Dead (pruned) rows can hold NaN after densification surgery; the
    weighted one-hot matmul must not let 0 * NaN poison the centers, and
    k-means++ init must separate well-separated blobs (plain random init
    measured collapsing at small k)."""
    import jax
    import jax.numpy as jnp

    from opengaussian_tpu.ops import kmeans as km

    rng = np.random.default_rng(0)
    n, cap = 900, 1024
    feats3 = rng.normal(size=(3, 6)).astype(np.float32)
    feats3 /= np.linalg.norm(feats3, axis=1, keepdims=True)
    xyz = np.zeros((cap, 3), np.float32)
    feat = np.full((cap, 6), np.nan, np.float32)  # dead rows NaN on purpose
    for b in range(3):
        sl = slice(b * 300, (b + 1) * 300)
        xyz[sl] = rng.normal(0, 0.15, (300, 3)) + np.array([b * 1.5, 0, 4.0])
        feat[sl] = feats3[b] + rng.normal(0, 0.05, (300, 6))
    alive = np.zeros(cap, bool)
    alive[:n] = True
    st = km.KMeansState.create(cap, 3, 2)
    st = km.assign_root(st, jnp.asarray(feat), jnp.asarray(xyz),
                        jnp.asarray(alive), 1.0, jax.random.PRNGKey(0),
                        init=True)
    assert np.isfinite(np.asarray(st.centers)).all()
    ids = np.asarray(st.cls_ids)[:n]
    true = np.repeat([0, 1, 2], 300)
    # every blob maps to its own root with high purity
    used = set()
    for b in range(3):
        h = np.bincount(ids[true == b], minlength=3)
        root = int(h.argmax())
        assert h[root] >= 270, h  # >=90% purity
        used.add(root)
    assert len(used) == 3


def test_kmeans_reassign_escapes_bad_basin_with_stable_labels():
    """A cached clustering where two centers sit inside one blob (and a third
    blob is merged) is a Lloyd fixed point; the reassign path must escape it
    via the k-means++ restart while keeping labels aligned to the cached ones,
    because leaf codebooks and the stage-2.2 round-robin key off root ids."""
    import jax
    import jax.numpy as jnp

    from opengaussian_tpu.ops import kmeans as km

    rng = np.random.default_rng(3)
    n = 900
    xyz = np.zeros((n, 3), np.float32)
    feat = np.zeros((n, 6), np.float32)
    blob_feats = np.eye(3, 6, dtype=np.float32) * 2.0
    for b in range(3):
        sl = slice(b * 300, (b + 1) * 300)
        xyz[sl] = rng.normal(0, 0.05, (300, 3)) + np.array([b * 3.0, 0, 4.0])
        feat[sl] = blob_feats[b] + rng.normal(0, 0.03, (300, 6))
    alive = np.ones(n, bool)
    true = np.repeat([0, 1, 2], 300)

    st = km.KMeansState.create(n, 3, 2)
    # Bad basin: centers 0 and 1 both inside blob 0 (split along a noise
    # direction), center 2 between blobs 1 and 2 (merged). Lloyd alone cannot
    # leave this configuration.
    cat = np.concatenate([feat, xyz], axis=1)
    bad = np.stack([
        cat[:300].mean(0) + 0.02,
        cat[:300].mean(0) - 0.02,
        cat[300:].mean(0),
    ]).astype(np.float32)
    st = st._replace(centers=jnp.asarray(bad))
    st = km.assign_root(st, jnp.asarray(feat), jnp.asarray(xyz), jnp.asarray(alive),
                        1.0, jax.random.PRNGKey(1), init=False)
    ids = np.asarray(st.cls_ids)
    roots = []
    for b in range(3):
        h = np.bincount(ids[true == b], minlength=3)
        root = int(h.argmax())
        assert h[root] >= 270, h
        roots.append(root)
    assert len(set(roots)) == 3
    # Label stability: blob 0 owned ids {0,1} and blobs 1+2 shared id 2 in the
    # cached clustering; greedy alignment must hand blob 0 one of its old ids
    # and keep id 2 on one of blobs 1/2 (no gratuitous relabeling of points
    # that stayed put).
    assert roots[0] in (0, 1)
    assert 2 in (roots[1], roots[2])
