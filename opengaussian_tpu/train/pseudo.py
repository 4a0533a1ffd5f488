"""Pseudo-label construction sweeps (stage 2/3 preprocessing).

jit-per-view rewrite of the reference's `construct_pseudo_ins_feat`
(reference train.py:659-954, SURVEY.md §3.3):

  sweep 1 (all modes): render the full-image instance features of every
    training view once (origin features, no rescale), average them inside
    each SAM mask, drop high-variance masks (> 0.006) except dominant-size
    ones (pixel count > 0.8 * max), and cache the per-view pseudo feature
    image + filtered mask id map.
  sweep 2 (leaf mode): render every coarse cluster per view (shared
    projection, vmapped blends), match clusters to pseudo masks by IoU > 0.2
    (base=former) and feature-distance gates (L1 < 0.9, L2 < 0.5, top-10 by
    L1), and derive per-root object counts iClusterSubNum (+1, clamped to k2)
    plus per-view cluster visibility.
  sweep 3 (lang mode) lives in train/lang.py.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.models.gaussians import GaussianState
from opengaussian_tpu.ops.rasterize import RasterizeConfig
from opengaussian_tpu.render import render, render_clusters
from opengaussian_tpu.utils import masks as masku

VAR_THRESHOLD = 0.006  # reference train.py:692
DOMINANT_FRAC = 0.8  # reference train.py:695
IOU_GATE = 0.2  # reference train.py:778
L1_GATE = 0.9  # reference train.py:792
L2_GATE = 0.5
MAX_MATCHED = 10  # reference train.py:793


class PseudoLabels(NamedTuple):
    feat: jnp.ndarray  # [V, H, W, 6] filtered pseudo features
    mask_ids: jnp.ndarray  # [V, H, W] int32 filtered pseudo mask ids (0 invalid)
    cluster_occur: jnp.ndarray | None = None  # [V, k1] bool (leaf mode)
    leaf_sub_num: jnp.ndarray | None = None  # [k1] int32 iClusterSubNum


def sweep1_math(feat, sam_ids, max_masks: int):
    """Post-render math of sweep 1 (shared by the single-device and the
    mesh-sharded paths): mask means + variance filter -> (pseudo feature
    image [H,W,6], filtered mask ids [H,W])."""
    masks, valid = masku.masks_onehot(sam_ids, max_masks)
    mean, var, counts = masku.mask_feature_mean(feat, masks, return_var=True)
    drop = (var > VAR_THRESHOLD) & valid
    dominant = counts > counts.max() * DOMINANT_FRAC
    drop = drop & ~dominant
    keep = valid & ~drop
    mean_kept = jnp.where(keep[:, None], mean, 0.0)
    # image-level pseudo features: gather by mask id (0 -> zeros row)
    table = jnp.concatenate([jnp.zeros((1, mean.shape[1])), mean_kept], axis=0)
    pseudo = table[jnp.clip(sam_ids, 0, max_masks)]
    filt_ids = jnp.where(keep[jnp.clip(sam_ids - 1, 0, max_masks - 1)] & (sam_ids > 0),
                         sam_ids, 0)
    return pseudo, filt_ids.astype(jnp.int32)


def sweep2_math(cluster_imgs, cluster_sils, cluster_occur, pseudo_feat,
                pseudo_ids, max_masks: int):
    """Post-render math of sweep 2 (shared single-device/sharded): IoU +
    feature-distance gates -> (matched_count [k1], occur [k1])."""
    pm, pm_valid = masku.masks_onehot(pseudo_ids, max_masks)  # [M,H,W]
    p_mean = masku.mask_feature_mean(pseudo_feat, pm)  # [M,6]

    def per_cluster(img, sil_raw, ok):
        sil = sil_raw > 0.9
        ious = masku.calculate_iou(pm, sil[None], base="former")  # [M]
        inter = (ious > IOU_GATE) & pm_valid
        c_mean = masku.mask_feature_mean(img, pm, image_mask=sil)  # [M,6]
        l1 = jnp.abs(p_mean - c_mean).sum(-1)
        l2 = jnp.sqrt(jnp.maximum(((p_mean - c_mean) ** 2).sum(-1), 0.0))
        good = inter & (l1 < L1_GATE) & (l2 < L2_GATE)
        n_good = good.sum()
        # cap at 10 by smallest l1 (reference keeps top-10 smallest l1)
        l1_rank = jnp.argsort(jnp.argsort(jnp.where(good, l1, jnp.inf)))
        good = good & (l1_rank < MAX_MATCHED)
        count = jnp.minimum(n_good, MAX_MATCHED)
        any_match = good.any() & ok
        return jnp.where(any_match, count, 0), any_match

    counts, occur = jax.vmap(per_cluster)(cluster_imgs, cluster_sils,
                                          cluster_occur)
    return counts.astype(jnp.int32), occur


@partial(jax.jit, static_argnames=("max_masks", "config"))
def _sweep1_view(gs: GaussianState, camera, sam_ids, bg, max_masks: int,
                 config: RasterizeConfig):
    out = render(
        camera, gs, bg, 3, config,
        render_color=False, render_feat_map=True, origin_feat=True,
        rescale_factor=1.0,
    )
    return sweep1_math(out.ins_feat, sam_ids, max_masks)


@partial(jax.jit, static_argnames=("max_masks", "k1", "config"))
def _sweep2_view(gs: GaussianState, camera, pseudo_feat, pseudo_ids, cls_ids, bg,
                 max_masks: int, k1: int, config: RasterizeConfig):
    """Returns (matched_count [k1], occur [k1])."""
    out = render_clusters(
        camera, gs, bg, cls_ids, jnp.arange(k1), config,
        origin_feat=True, better_vis=True, scale_limit=0.5, min_points=100,
    )
    return sweep2_math(out.cluster_imgs, out.cluster_silhouettes,
                       out.cluster_occur, pseudo_feat, pseudo_ids, max_masks)


def construct_pseudo_labels(
    gs: GaussianState,
    cameras,  # list of Camera (sorted by image_name, as reference train.py:673)
    sam_ids: jnp.ndarray,  # [V, H, W] decoded SAM ids at the training level
    bg: jnp.ndarray,
    max_masks: int,
    config: RasterizeConfig,
    mode: str = "root",
    cls_ids: jnp.ndarray | None = None,
    k1: int = 64,
    k2: int = 5,
    to_host: bool = False,
    sweep_fns=None,
) -> PseudoLabels:
    """to_host=True keeps the per-view pseudo-feature images in host memory
    (save_memory mode): at V views of HxWx6 f32 this is the single largest
    training-time buffer, and the trainer streams one view per step.

    sweep_fns: optional namespace with .sweep1(gs, cam, sam_ids, bg) and
    .sweep2(gs, cam, pseudo_feat, pseudo_ids, cls_ids, bg) overriding the
    single-device jitted sweeps — parallel/sweeps.make_sweep_fns provides
    mesh-sharded twins so a sharded state is never gathered to one device."""
    sweep1 = (sweep_fns.sweep1 if sweep_fns is not None else
              lambda g, c, s, b: _sweep1_view(g, c, s, b, max_masks, config))
    sweep2 = (sweep_fns.sweep2 if sweep_fns is not None else
              lambda g, c, f, m, ci, b: _sweep2_view(g, c, f, m, ci, b,
                                                     max_masks, k1, config))
    stack = (lambda xs: np.stack([np.asarray(x) for x in xs])) if to_host \
        else jnp.stack
    feats, ids = [], []
    for i, cam in enumerate(cameras):
        f, m = sweep1(gs, cam, jnp.asarray(sam_ids[i]), bg)
        feats.append(f)
        ids.append(m)
    feat = stack(feats)
    mask_ids = stack(ids)

    occur = None
    sub_num = None
    if mode == "leaf":
        assert cls_ids is not None
        counts = jnp.ones((k1,), jnp.int32)
        occ = []
        for i, cam in enumerate(cameras):
            c, o = sweep2(
                gs, cam, jnp.asarray(feat[i]), jnp.asarray(mask_ids[i]),
                cls_ids, bg,
            )
            counts = jnp.maximum(counts, c)
            occ.append(o)
        occur = stack(occ)
        # reference: iClusterSubNum = (max_count + 1).clamp(max=k2) train.py:835
        sub_num = jnp.minimum(counts + 1, k2)
    return PseudoLabels(feat=feat, mask_ids=mask_ids, cluster_occur=occur,
                        leaf_sub_num=sub_num)
