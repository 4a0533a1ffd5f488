"""Stage 3: 2D CLIP language feature -> 3D leaf cluster association.

Rewrite of the reference's "lang" sweep (reference train.py:842-954,
SURVEY.md §3.3): for every (coarse root, training view), render the root's k2
leaf clusters (shared projection, vmapped blends), score each leaf against
every pseudo mask with IoU * (1 - L1(feature means)) (Eq.(5) of the paper),
take the best mask above 0.2, and average the matched masks' CLIP features
per leaf across views. Saves the same `cluster_lang.npz` artifact
{leaf_feat [k1*k2,512], leaf_score, occu_count, leaf_ind [num_pts]}.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.ops.rasterize import RasterizeConfig
from opengaussian_tpu.render import render_clusters
from opengaussian_tpu.utils import masks as masku

MATCH_THRESHOLD = 0.2  # reference train.py:887
SIL_THRESHOLD = 0.8
MIN_LEAF_POINTS = 10  # reference train.py:312-313


def score_leaves(cluster_imgs, cluster_sils, cluster_valid, pm, pm_valid,
                 p_mean, root_visible):
    """Post-render scoring of one root's k2 leaves (shared single-device /
    sharded): IoU * (1 - L1) over pseudo masks -> (mask id [k2] 1-based,
    score [k2], matched [k2] bool)."""
    sils = cluster_sils > SIL_THRESHOLD  # [k2,H,W]
    pred_mean = masku.pair_mask_feature_mean(cluster_imgs, sils)  # [k2,6]
    ious = masku.calculate_iou(pm[None], sils[:, None])  # [k2, M]
    l1 = jnp.abs(pred_mean[:, None, :] - p_mean[None, :, :]).sum(-1)  # [k2,M]
    scores = ious * (1.0 - l1)
    scores = jnp.where(pm_valid[None, :], scores, -jnp.inf)

    max_ind = jnp.argmax(scores, axis=-1)  # [k2] 0-based mask slot
    max_score = jnp.take_along_axis(scores, max_ind[:, None], axis=-1)[:, 0]
    matched = (max_score > MATCH_THRESHOLD) & cluster_valid & root_visible
    # mask ids are 1-based (0 = invalid); unmatched record id 0, score 0
    mask_id = jnp.where(matched, max_ind + 1, 0)
    score = jnp.where(matched, max_score, 0.0)
    return mask_id.astype(jnp.int32), score, matched


@partial(jax.jit, static_argnames=("k1", "k2", "max_masks", "config"))
def _associate_view(gs, kms_leaf_ids, camera, pseudo_feat, pseudo_ids,
                    occur_row, bg, k1: int, k2: int, max_masks: int,
                    config: RasterizeConfig):
    """All k1 roots of ONE view in a single dispatch (lax.scan over roots):
    collapses the reference's k1*V rasterization storm (reference
    train.py:842-954) to V dispatches while peak memory stays at one root's
    k2-leaf render. -> (mask id [k1*k2], score [k1*k2], matched [k1*k2])."""
    pm, pm_valid = masku.masks_onehot(pseudo_ids, max_masks)  # [M,H,W]
    p_mean = masku.mask_feature_mean(pseudo_feat, pm)  # [M,6]

    # On the stream path, one root's k2 leaves render as ONE partition
    # rasterize (shared binning/sort/kernel launch), with the projection +
    # depth rank hoisted across the whole k1-root scan: the scan-mode
    # per-leaf renders cost ~4.6 ms of fixed latency each (searchsorted +
    # launch overhead, NOT window DMA — shallow-K A/B moved nothing), which
    # made the 320 renders 1472 ms of a 1505 ms lang view at the ScanNet
    # recipe shape. Elsewhere (XLA/CPU) the per-group scan remains.
    use_partition = config.use_pallas() and config.pallas_input == "stream"
    if use_partition:
        from opengaussian_tpu.ops.binning import depth_rank
        from opengaussian_tpu.ops.projection import build_cov3d, project
        from opengaussian_tpu.render import render_clusters_partition

        cov3d = build_cov3d(gs.scales, gs.quats)
        opac_all = jnp.where(gs.alive, gs.opacity, 0.0)
        proj = project(
            gs.means, cov3d, camera,
            opacities=opac_all if config.tight_radius else None,
        )
        rank = depth_rank(jax.lax.stop_gradient(proj.depth))

    def body(_, root_id):
        group_ids = root_id * k2 + jnp.arange(k2)
        if use_partition:
            out = render_clusters_partition(
                camera, gs, bg, kms_leaf_ids, group_ids, config,
                origin_feat=True, better_vis=False,
                min_points=MIN_LEAF_POINTS, proj=proj, rank=rank,
            )
        else:
            out = render_clusters(
                camera, gs, bg, kms_leaf_ids, group_ids, config,
                origin_feat=True, better_vis=False,
                min_points=MIN_LEAF_POINTS,
            )
        res = score_leaves(out.cluster_imgs, out.cluster_silhouettes,
                           out.cluster_valid, pm, pm_valid, p_mean,
                           occur_row[root_id])
        return None, res

    _, (mid, sc, ok) = jax.lax.scan(body, None, jnp.arange(k1))
    return mid.reshape(-1), sc.reshape(-1), ok.reshape(-1)


def associate_language(
    state,
    kms,
    bundle,  # ViewBundle
    pseudo,  # PseudoLabels (feat + mask_ids + cluster_occur)
    clip_tables: list[np.ndarray | None],  # per view [num_mask_level, 512]
    bg,
    k1: int,
    k2: int,
    config: RasterizeConfig,
    out_path: str | None = None,
    view_fn=None,
) -> dict:
    """view_fn: optional override of the per-view association
    (gs, leaf_ids, camera, pseudo_feat, pseudo_ids, occur_row, bg) ->
    ([k1*k2] id, score, matched) — parallel/sweeps.make_sweep_fns provides a
    mesh-sharded twin."""
    V = bundle.num_views
    match_id = np.zeros((k1 * k2, V), np.int64)
    match_score = np.zeros((k1 * k2, V), np.float32)
    match_ok = np.zeros((k1 * k2, V), bool)
    if view_fn is None:
        view_fn = lambda gs, li, cam, pf, pi, oc, b: _associate_view(
            gs, li, cam, pf, pi, oc, b, k1, k2, bundle.max_masks, config
        )

    for v in range(V):
        occur_row = (
            jnp.asarray(pseudo.cluster_occur[v])
            if pseudo.cluster_occur is not None
            else jnp.ones((k1,), bool)
        )
        mid, sc, ok = view_fn(
            state, kms.leaf_cls_ids, bundle.camera(v),
            jnp.asarray(pseudo.feat[v]), jnp.asarray(pseudo.mask_ids[v]),
            occur_row, bg,
        )
        match_id[:, v] = np.asarray(mid)
        match_score[:, v] = np.asarray(sc)
        match_ok[:, v] = np.asarray(ok)

    occu_count = match_ok.sum(axis=1).astype(np.float32)  # [k1*k2]
    leaf_score = match_score.sum(axis=1) / (occu_count + 1e-6)

    feat_sum = np.zeros((k1 * k2, 512), np.float32)
    for v in range(V):
        tab = clip_tables[v]
        if tab is None:
            continue
        # row 0 = zero feature for unmatched leaves (reference train.py:930-938)
        tab0 = np.concatenate([np.zeros((1, tab.shape[1]), np.float32), tab], axis=0)
        ids = np.clip(match_id[:, v], 0, tab0.shape[0] - 1)
        feat_sum += tab0[ids]
    leaf_feat = feat_sum / (occu_count + 1e-4)[:, None]

    alive = np.asarray(state.alive)
    result = dict(
        leaf_feat=leaf_feat,
        leaf_score=leaf_score,
        occu_count=occu_count,
        leaf_ind=np.asarray(kms.leaf_cls_ids)[alive],
    )
    if out_path:
        np.savez(out_path, **result)
    return result


def clip_tables_from_views(views, sam_level: int) -> list[np.ndarray | None]:
    """Per-view CLIP feature tables sliced to the training SAM level
    (reference train.py:922-929, utils/opengs_utlis.py:173-180)."""
    out = []
    for v in views:
        if v.clip_feats is None or v.sam_mask is None:
            out.append(None)
            continue
        lo, hi = masku.clip_feat_slice(np.asarray(v.sam_mask), sam_level)
        out.append(np.asarray(v.clip_feats[lo:hi], np.float32))
    return out
