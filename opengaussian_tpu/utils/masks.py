"""SAM mask decoding and per-mask feature statistics.

jit-friendly equivalents of the reference's mask utilities
(reference utils/opengs_utlis.py:125-283). Differences by design:

  * masks live as a dense id map [H, W] plus a static max_masks bound, so
    every view compiles to the same shapes (the reference materializes a
    dynamic [num_mask, H, W] one-hot);
  * per-mask means/variances are one [M, HW] x [HW, C] matmul (MXU) instead
    of chunked elementwise loops working around GPU OOM
    (reference utils/opengs_utlis.py:203-283).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def decode_sam_level(packed: np.ndarray, level: int) -> np.ndarray:
    """Packed 4-level SAM mask [4, H, W] -> mask ids [H, W] at `level`.

    Semantics of reference utils/opengs_utlis.py:134-146: level>0 ids are
    offset by (max id of previous level + 1); anything negative becomes the
    invalid id 0; valid masks are 1..num_mask.
    """
    mask_id = packed[level].astype(np.int64)
    if level > 0:
        mask_id = mask_id - (packed[level - 1].max() + 1)
    mask_id = np.clip(mask_id, -1, None) + 1
    return mask_id


def clip_feat_slice(packed: np.ndarray, level: int) -> tuple[int, int]:
    """Range [min, max) into the per-image CLIP feature table for `level`
    (reference utils/opengs_utlis.py:173-180)."""
    max_ind = int(packed[level].max()) + 1
    min_ind = int(packed[level - 1].max()) + 1 if level > 0 else 0
    return min_ind, max_ind


def masks_onehot(mask_id: jnp.ndarray, max_masks: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """mask ids [H, W] (0 invalid) -> bool [M, H, W] for ids 1..M plus a
    validity vector [M] (True where the mask has any pixel)."""
    ids = jnp.arange(1, max_masks + 1, dtype=mask_id.dtype)
    onehot = mask_id[None, :, :] == ids[:, None, None]
    return onehot, onehot.any(axis=(1, 2))


def mask_feature_mean(
    feat_map: jnp.ndarray,
    masks: jnp.ndarray,
    image_mask: jnp.ndarray | None = None,
    return_var: bool = False,
):
    """Mean (and optionally variance) of feat_map within each mask.

    feat_map [H, W, C], masks [M, H, W] bool -> mean [M, C]
    (reference utils/opengs_utlis.py:240-283, without the chunking).
    """
    H, W, C = feat_map.shape
    m = masks.reshape(masks.shape[0], -1).astype(jnp.float32)  # [M, HW]
    if image_mask is not None:
        m = m * image_mask.reshape(1, -1).astype(jnp.float32)
    f = feat_map.reshape(-1, C)  # [HW, C]
    counts = jnp.maximum(m.sum(axis=1), 1.0)  # [M]
    mean = (m @ f) / counts[:, None]  # [M, C]
    if not return_var:
        return mean
    sq = (m @ (f * f)) / counts[:, None]
    var_per_channel = sq - mean * mean
    return mean, var_per_channel.mean(axis=1), counts


def pair_mask_feature_mean(feat_maps: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Per-pair mean: feat_maps [M, H, W, C], masks [M, H, W] -> [M, C]
    (reference utils/opengs_utlis.py:184-201)."""
    m = masks.astype(jnp.float32)
    counts = m.sum(axis=(1, 2)) + 1e-6
    summ = jnp.einsum("mhwc,mhw->mc", feat_maps, m)
    return summ / counts[:, None]


def calculate_iou(mask1: jnp.ndarray, mask2: jnp.ndarray, base: str = "union"):
    """IoU between two boolean mask stacks, broadcast over leading dims.
    base='former'/'later' divides by one side's area instead of the union
    (reference utils/opengs_utlis.py:90-123)."""
    inter = jnp.logical_and(mask1, mask2).sum(axis=(-2, -1)).astype(jnp.float32)
    if base == "former":
        denom = mask1.sum(axis=(-2, -1)).astype(jnp.float32)
    elif base == "later":
        denom = mask2.sum(axis=(-2, -1)).astype(jnp.float32)
    else:
        denom = jnp.logical_or(mask1, mask2).sum(axis=(-2, -1)).astype(jnp.float32)
    return inter / jnp.maximum(denom, 1.0)
