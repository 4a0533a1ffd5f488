"""Positive-path tests for the leaf-mode pseudo sweep and stage 2.2.

The stage-machine toy test runs on a scene too degenerate to pass the
reference's cluster gates (>=100 points, scales<0.5, IoU>0.2, feature
distances — reference gaussian_renderer/__init__.py:184-236,
train.py:753-836), so stage 2.2 there is correctly loss-gated to zero.
Here two well-separated blobs with aligned SAM masks must MATCH, and a
stage-2.2 step must produce a nonzero loss and instance-feature gradient.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.config import OptimizationConfig
from opengaussian_tpu.models import optimizer as opt_mod
from opengaussian_tpu.models.gaussians import create_from_pcd
from opengaussian_tpu.ops import kmeans as km
from opengaussian_tpu.ops.rasterize import RasterizeConfig
from opengaussian_tpu.render import render
from opengaussian_tpu.train import pseudo as pseudo_mod

RCFG = RasterizeConfig(max_per_tile=256, chunk=32, min_intersections=16384)


def aligned_scene():
    rng = np.random.default_rng(0)
    n = 300
    pts = np.concatenate([
        rng.normal(0, 0.08, (150, 3)) + np.array([-0.5, 0, 3.0]),
        rng.normal(0, 0.08, (150, 3)) + np.array([0.5, 0, 3.0]),
    ]).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, (n, 3)).astype(np.float32)
    gs = create_from_pcd(pts, cols, capacity=n, seed=0)
    gs = dataclasses.replace(
        gs,
        log_scales=jnp.full_like(gs.log_scales, np.log(0.05)),
        logit_opacity=jnp.full((n,), 4.0),
        ins_feat=jnp.asarray(np.concatenate([
            np.tile([0.9, -0.9, 0.9, -0.9, 0.9, -0.9], (150, 1)),
            np.tile([-0.9, 0.9, -0.9, 0.9, -0.9, 0.9], (150, 1)),
        ]).astype(np.float32)),
    )
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 1.0, 0.8, 160, 120)
    cls_ids = jnp.asarray(np.array([0] * 150 + [1] * 150, np.int32))
    out = render(cam, gs, jnp.zeros(3), 3, RCFG, render_color=False,
                 render_feat_map=True, origin_feat=True, rescale_factor=1.0)
    sil = np.asarray(out.silhouette)
    sam = np.zeros((120, 160), np.int32)
    sam[:, :80] = 1
    sam[:, 80:] = 2
    sam = np.where(sil > 0.5, sam, 0)
    return gs, cam, cls_ids, sam


def test_sweep2_matches_aligned_clusters():
    gs, cam, cls_ids, sam = aligned_scene()
    labels = pseudo_mod.construct_pseudo_labels(
        gs, [cam], jnp.asarray(sam)[None], jnp.zeros(3), 8, RCFG,
        mode="leaf", cls_ids=cls_ids, k1=2, k2=3,
    )
    occ = np.asarray(labels.cluster_occur)
    assert occ.shape == (1, 2) and occ.all()
    assert (np.asarray(labels.leaf_sub_num) >= 2).all()


def test_stage22_nonzero_loss_and_grad():
    from opengaussian_tpu.train.loop import ViewBundle, stage22_step

    gs, cam, cls_ids, sam = aligned_scene()
    labels = pseudo_mod.construct_pseudo_labels(
        gs, [cam], jnp.asarray(sam)[None], jnp.zeros(3), 8, RCFG,
        mode="leaf", cls_ids=cls_ids, k1=2, k2=3,
    )
    kms = km.KMeansState.create(gs.capacity, 2, 3)
    key = jnp.array([0, 1], jnp.uint32)
    kms = km.assign_root(kms, gs.ins_feat, gs.means, gs.alive, 1.0, key, init=True)
    kms = km.assign_leaf(kms, gs.ins_feat, gs.alive, jnp.int32(0), key, k2=3,
                         init=True)
    H, W = cam.height, cam.width
    bundle = ViewBundle(
        R=cam.R_w2c[None], t=cam.t_w2c[None], fx=jnp.asarray([cam.fx]),
        fy=jnp.asarray([cam.fy]), cx=jnp.asarray([cam.cx]),
        cy=jnp.asarray([cam.cy]),
        gt_images=jnp.zeros((1, H, W, 3)), alpha_masks=jnp.ones((1, H, W)),
        has_alpha=jnp.asarray([False]), sam_ids=jnp.asarray(sam)[None],
        width=W, height=H, max_masks=8,
    )
    adam = opt_mod.init(gs.params())
    ocfg = OptimizationConfig(root_node_num=2, leaf_node_num=3)
    # perturb features so the L2-to-pseudo loss cannot be exactly zero
    gs2 = dataclasses.replace(gs, ins_feat=gs.ins_feat * 0.5)
    feat_before = np.asarray(gs2.ins_feat).copy()  # stage22_step donates gs2
    new_state, _, loss, ok, _lost = stage22_step(
        gs2, adam, kms, bundle, jnp.int32(0), jnp.int32(1), jnp.zeros(3),
        jnp.float32(1.0), labels.feat[0], jnp.int32(0),
        labels.cluster_occur[0, 0], RCFG, ocfg, False,
    )
    assert bool(ok)
    assert float(loss) > 1e-4
    d = np.abs(np.asarray(new_state.ins_feat) - feat_before)
    assert d.max() > 0  # features actually updated
