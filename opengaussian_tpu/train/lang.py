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


@partial(jax.jit, static_argnames=("k2", "max_masks", "config"))
def _associate_root_view(gs, kms_leaf_ids, camera, pseudo_feat, pseudo_ids,
                         root_id, root_visible, bg, k2: int, max_masks: int,
                         config: RasterizeConfig):
    """-> (matched mask id [k2], score [k2], matched [k2] bool)."""
    group_ids = root_id * k2 + jnp.arange(k2)
    out = render_clusters(
        camera, gs, bg, kms_leaf_ids, group_ids, config,
        origin_feat=True, better_vis=False, min_points=MIN_LEAF_POINTS,
    )
    sils = out.cluster_silhouettes > SIL_THRESHOLD  # [k2,H,W]
    pred_mean = masku.pair_mask_feature_mean(out.cluster_imgs, sils)  # [k2,6]

    pm, pm_valid = masku.masks_onehot(pseudo_ids, max_masks)  # [M,H,W]
    p_mean = masku.mask_feature_mean(pseudo_feat, pm)  # [M,6]

    ious = masku.calculate_iou(pm[None], sils[:, None])  # [k2, M]
    l1 = jnp.abs(pred_mean[:, None, :] - p_mean[None, :, :]).sum(-1)  # [k2,M]
    scores = ious * (1.0 - l1)
    scores = jnp.where(pm_valid[None, :], scores, -jnp.inf)

    max_ind = jnp.argmax(scores, axis=-1)  # [k2] 0-based mask slot
    max_score = jnp.take_along_axis(scores, max_ind[:, None], axis=-1)[:, 0]
    matched = (max_score > MATCH_THRESHOLD) & out.cluster_valid & root_visible
    # mask ids are 1-based (0 = invalid); unmatched record id 0, score 0
    mask_id = jnp.where(matched, max_ind + 1, 0)
    score = jnp.where(matched, max_score, 0.0)
    return mask_id.astype(jnp.int32), score, matched


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
) -> dict:
    V = bundle.num_views
    match_id = np.zeros((k1 * k2, V), np.int64)
    match_score = np.zeros((k1 * k2, V), np.float32)
    match_ok = np.zeros((k1 * k2, V), bool)

    for root in range(k1):
        for v in range(V):
            vis = (
                pseudo.cluster_occur[v, root]
                if pseudo.cluster_occur is not None
                else jnp.bool_(True)
            )
            mid, sc, ok = _associate_root_view(
                state, kms.leaf_cls_ids, bundle.camera(v), pseudo.feat[v],
                pseudo.mask_ids[v], jnp.int32(root), vis, bg,
                k2, bundle.max_masks, config,
            )
            sl = slice(root * k2, root * k2 + k2)
            match_id[sl, v] = np.asarray(mid)
            match_score[sl, v] = np.asarray(sc)
            match_ok[sl, v] = np.asarray(ok)

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
