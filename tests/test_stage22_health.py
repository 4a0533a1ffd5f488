"""Stage-2.2 codebook health yardstick (VERDICT r4 item 8).

The flat stage-2.2 loss trajectory oscillates because each step trains ONE
root (round-robin); whether that is benign or an instability needs the
reference's own objective as the yardstick. Two pins:

  * the step's returned loss equals a direct torch transcription of the
    reference's leaf-mode loss (reference train.py:475-489 with
    gaussian_renderer/__init__.py:184-186: better_vis=False renders ONLY
    the selected root with leaf-quantized features, one masked l2 over the
    >0.7 silhouette, loss 0 when the root is invisible);
  * the PER-ROOT trajectories converge on a coherent toy scene: training
    stage 2.2 with periodic leaf re-assignment must shrink every visible
    root's loss — the envelope a codebook regression (bad STE wiring, wrong
    center updates, silhouette gate drift) would break.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.config import OptimizationConfig
from opengaussian_tpu.models import optimizer as opt_mod
from opengaussian_tpu.models.gaussians import create_from_pcd
from opengaussian_tpu.ops import kmeans as km
from opengaussian_tpu.ops.rasterize import RasterizeConfig
from opengaussian_tpu.render import render_clusters
from opengaussian_tpu.train import loop as L

K1, K2 = 4, 2
W, H = 96, 72
RCFG = RasterizeConfig(max_per_tile=256, chunk=32, min_intersections=32768)


def scene(seed=0, n=600):
    """Coherent scene: 4 spatial blobs (roots), 2 depth slabs each (leaves),
    near-constant per-leaf features + a pseudo-feature map rendered FROM
    the leaf features, so the stage-2.2 objective is satisfiable."""
    rng = np.random.default_rng(seed)
    centers = np.array([[-0.7, -0.5, 4.0], [0.7, -0.5, 4.2],
                        [-0.7, 0.5, 3.8], [0.7, 0.5, 4.0]], np.float32)
    per = n // K1
    pts, root, leaf = [], [], []
    for i in range(K1):
        p = rng.normal(0, 0.18, (per, 3)).astype(np.float32) + centers[i]
        pts.append(p)
        root.append(np.full(per, i))
        leaf.append(i * K2 + (p[:, 2] > centers[i, 2]).astype(np.int32))
    pts = np.concatenate(pts)
    root = np.concatenate(root)
    leaf = np.concatenate(leaf)
    leaf_feat = rng.uniform(-0.9, 0.9, (K1 * K2, 6)).astype(np.float32)
    feat = (leaf_feat[leaf]
            + rng.normal(0, 0.05, (n, 6)).astype(np.float32))
    st = create_from_pcd(pts, rng.uniform(0, 1, (n, 3)).astype(np.float32),
                         capacity=n, seed=1)
    st = dataclasses.replace(
        st,
        log_scales=st.log_scales * 0 + np.log(0.06),
        logit_opacity=jnp.full((n,), 2.0),
        ins_feat=jnp.asarray(feat),
    )
    root_centers = np.zeros((K1, 9), np.float32)
    f9 = np.concatenate([feat, pts * 0.3], -1)
    for i in range(K1):
        root_centers[i] = f9[root == i].mean(0)
    leaf_centers = np.zeros((K1 * K2 + 1, 6), np.float32)
    for l in range(K1 * K2):
        leaf_centers[l] = feat[leaf == l].mean(0)
    kms = km.KMeansState(
        centers=jnp.asarray(root_centers), cls_ids=jnp.asarray(root, jnp.int32),
        leaf_centers=jnp.asarray(leaf_centers),
        leaf_cls_ids=jnp.asarray(leaf, jnp.int32),
        leaf_sub_num=jnp.full((K1,), K2, jnp.int32),
    )
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 1.0, 0.8, W, H)
    # pseudo features = the scene's own leaf features rendered as an image
    from opengaussian_tpu.ops.projection import build_cov3d
    from opengaussian_tpu.ops.rasterize import rasterize

    pay = (jnp.asarray(leaf_feat)[jnp.asarray(leaf)] + 1.0) / 2.0
    out = rasterize(cam, st.means, build_cov3d(st.scales, st.quats),
                    st.opacity, pay, jnp.zeros(6), RCFG)
    return st, kms, cam, jnp.asarray(out.image)


def bundle_for(cam, rng):
    gt = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    sam = np.ones((1, H, W), np.int32)
    return L.ViewBundle(
        R=jnp.asarray(np.asarray(cam.R_w2c)[None]),
        t=jnp.asarray(np.asarray(cam.t_w2c)[None]),
        fx=jnp.asarray([cam.fx]), fy=jnp.asarray([cam.fy]),
        cx=jnp.asarray([cam.cx]), cy=jnp.asarray([cam.cy]),
        gt_images=jnp.asarray(gt),
        alpha_masks=jnp.ones((1, H, W), jnp.float32),
        has_alpha=jnp.zeros((1,), bool),
        sam_ids=jnp.asarray(sam), width=W, height=H, max_masks=8,
    )


def ref_leaf_loss_torch(cluster_img, cluster_sil, pseudo_feat, visible):
    """Transcription of reference train.py:475-489 for the leaf mode's
    single selected-root render: masked l2 over the >0.7 silhouette."""
    torch = pytest.importorskip("torch")
    pred = torch.asarray(np.asarray(cluster_img))
    sil = (torch.asarray(np.asarray(cluster_sil)) > 0.7).float().unsqueeze(-1)
    gt = torch.asarray(np.asarray(pseudo_feat))
    if not visible:
        return 0.0
    return float(((pred - gt) ** 2 * sil).sum() / sil.sum().clamp(min=1))


def test_stage22_loss_matches_reference_transcription():
    st, kms, cam, pseudo = scene()
    rng = np.random.default_rng(3)
    bundle = bundle_for(cam, rng)
    ocfg = OptimizationConfig(root_node_num=K1, leaf_node_num=K2)
    adam = opt_mod.init(st.params())
    for rid in range(K1):
        # the step's render, reproduced outside the jit
        q = km.quantize(kms, st.ins_feat, "leaf")
        out = render_clusters(cam, st, jnp.zeros(3), kms.cls_ids,
                              jnp.asarray([rid]), RCFG, quantized_feat=q,
                              rescale_factor=jnp.float32(1.0), min_points=1)
        visible = bool(out.cluster_occur[0])
        want = ref_leaf_loss_torch(out.cluster_imgs[0],
                                   out.cluster_silhouettes[0], pseudo,
                                   visible)
        _, _, loss, ok, _ = L.stage22_step(
            jax.tree.map(jnp.copy, st), jax.tree.map(jnp.copy, adam), kms,
            bundle, jnp.int32(0), jnp.int32(71_000), jnp.zeros(3),
            jnp.float32(1.0), pseudo, jnp.int32(rid), jnp.asarray(True),
            RCFG, ocfg)
        assert bool(ok) == visible
        np.testing.assert_allclose(float(loss), want, rtol=2e-4, atol=1e-6)


def test_stage22_per_root_losses_converge():
    st, kms, cam, pseudo = scene(seed=5)
    rng = np.random.default_rng(4)
    bundle = bundle_for(cam, rng)
    ocfg = OptimizationConfig(root_node_num=K1, leaf_node_num=K2)
    adam = opt_mod.init(st.params())
    # perturb the features away from the pseudo targets so there is
    # something to learn — a SYSTEMATIC per-leaf offset (iid noise would
    # average out of the leaf centers and the quantized render would start
    # at its floor), then train stage 2.2 round-robin with periodic leaf
    # re-assignment (the trainer's cadence)
    leaf_off = jnp.asarray(rng.normal(0, 0.3, (K1 * K2, 6)), jnp.float32)
    st = dataclasses.replace(
        st, ins_feat=st.ins_feat + leaf_off[kms.leaf_cls_ids])
    key = jax.random.PRNGKey(0)
    kms = km.assign_leaf(kms, st.ins_feat, st.alive, jnp.int32(0), key, K2,
                         init=True)
    per_root = {r: [] for r in range(K1)}
    it = 70_000
    last_rid = 0
    for step in range(64):
        rid = (step // 4) % K1
        if rid != last_rid:
            # the trainer's cadence: re-assign the CURRENT root's leaves
            # from the trained features when rotation reaches it (the
            # centers are what the render quantizes to — a root's loss only
            # moves when ITS leaves re-assign; see the module docstring's
            # cached-centers pin)
            key, sub = jax.random.split(key)
            kms = km.assign_leaf(kms, st.ins_feat, st.alive, jnp.int32(rid),
                                 sub, K2)
            last_rid = rid
        it += 1
        st, adam, loss, ok, _ = L.stage22_step(
            st, adam, kms, bundle, jnp.int32(0), jnp.int32(it),
            jnp.zeros(3), jnp.float32(1.0), pseudo, jnp.int32(rid),
            jnp.asarray(True), RCFG, ocfg)
        if bool(ok):
            per_root[rid].append(float(loss))
    for r, tr in per_root.items():
        assert len(tr) >= 4, f"root {r} never visible"
        first = np.mean(tr[: len(tr) // 2])
        last = np.mean(tr[len(tr) // 2:])
        # each root gets ~lr*steps of feature movement between its leaf
        # re-assigns, so the per-visit decrease is small but must be REAL
        # and monotone-ish; a codebook regression flatlines or diverges
        assert last < 0.98 * first, (
            f"root {r} not converging: {first:.4f} -> {last:.4f}")
        assert last < 0.5, f"root {r} loss implausibly high: {last:.4f}"
