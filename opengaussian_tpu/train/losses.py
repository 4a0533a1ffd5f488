"""Training losses.

jit-friendly versions of the reference's losses: masked L1/L2
(reference utils/loss_utils.py:17-31), the stage-1 intra-mask cohesion loss
(reference train.py:102-121) and inter-mask separation loss
(reference train.py:123-155). All mask stacks are statically sized [M, H, W]
with a validity vector, so a view with fewer SAM masks compiles to the same
program; the math over padded entries reproduces the dynamic-shape reference
exactly.
"""

from __future__ import annotations

import jax.numpy as jnp

from opengaussian_tpu.ops.ssim import ssim  # re-export for the trainer


def l1_loss(pred, gt, mask=None, weight=None):
    if mask is None:
        return jnp.abs(pred - gt).mean()
    if weight is None:
        weight = 1.0
    return jnp.abs((pred - gt) * mask * weight).sum() / jnp.maximum(mask.sum(), 1.0)


def l2_loss(pred, gt, mask=None, weight=None):
    if mask is None:
        return ((pred - gt) ** 2).mean()
    if weight is None:
        weight = 1.0
    return ((pred - gt) ** 2 * mask * weight).sum() / jnp.maximum(mask.sum(), 1.0)


def rgb_loss(pred, gt, lambda_dssim: float = 0.2):
    """Stage-0 photometric loss: (1-l)*L1 + l*(1-SSIM) (reference train.py:384-386)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, gt) + lambda_dssim * (
        1.0 - ssim(pred, gt)
    )


def cohesion_loss(feat_map, masks, mask_valid, feat_means):
    """Intra-mask smoothing: pull each pixel's feature toward its mask mean.

    feat_map [H, W, C]; masks [M, H, W] bool; mask_valid [M] bool;
    feat_means [M, C]. Per mask: mean over its pixels of ||f(p) - mean||_2;
    averaged over valid masks (reference train.py:102-121).
    """
    m = masks.astype(jnp.float32)
    # dist [M, H, W] = || f(p) - mean_m ||; double-where so exact-zero diffs
    # (empty masks, background pixels) don't emit NaN gradients
    diff = feat_map[None] - feat_means[:, None, None, :]
    sq = jnp.sum(diff * diff, axis=-1)
    dist = jnp.where(sq > 0, jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0) * m
    per_mask = dist.sum(axis=(1, 2)) / jnp.maximum(m.sum(axis=(1, 2)), 1.0)
    per_mask = jnp.where(mask_valid, per_mask, 0.0)
    return per_mask.sum() / jnp.maximum(mask_valid.sum(), 1)


def separation_loss(feat_means, mask_valid, iteration):
    """Inter-mask contrastive loss: penalize inverse squared distances between
    mask mean features, with the reference's rank-based pair weighting and
    the >35k-iteration hard-pair focus (reference train.py:123-155).

    feat_means [M, C] (padded rows arbitrary); mask_valid [M] bool;
    iteration: traced scalar.
    """
    M = feat_means.shape[0]
    v = mask_valid
    n_valid = v.sum().astype(jnp.float32)  # reference N
    pair_valid = v[:, None] & v[None, :]
    diff2 = jnp.sum((feat_means[:, None, :] - feat_means[None, :, :]) ** 2, axis=-1)
    inv = 1.0 / (diff2 + 1.0)
    eye = jnp.eye(M, dtype=bool)
    inv = jnp.where(eye | ~pair_valid, 0.0, inv)

    # rank ascending per row; invalid entries pushed below everything so that
    # valid entries keep the ranks they would have in the dynamic version
    rank_key = jnp.where(pair_valid & ~eye, inv, -1.0)
    ranks = jnp.argsort(jnp.argsort(rank_key, axis=1), axis=1).astype(jnp.float32)
    n_invalid = (M - n_valid)  # entries ranked below the diagonal zero
    ref_rank = ranks - n_invalid  # diagonal ~0, valid pairs 1..n_valid-1
    weight = (ref_rank / jnp.maximum(n_valid - 1.0, 1.0)) * 0.9 + 0.1
    weight = jnp.clip(weight, 0.1, 1.0)
    weight = jnp.where(iteration > 35_000, jnp.where(weight < 0.9, 0.1, weight), weight)
    inv = inv * weight
    denom = jnp.maximum(n_valid * (n_valid - 1.0), 1.0)
    return inv.sum() / denom


def psnr(pred, gt):
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
