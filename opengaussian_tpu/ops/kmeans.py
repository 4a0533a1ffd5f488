"""Two-level k-means codebook for instance-feature discretization.

TPU rewrite of the reference's `Quantize_kMeans` (reference
scene/kmeans_quantize.py:12-280). Semantics preserved:

  * coarse (root) level clusters cat(ins_feat, xyz * pos_weight) [N, 9] into
    k1 centers; fine (leaf) level clusters the 6-D features of ONE root's
    points into that root's k2 slots, with an extra "unassigned" bucket at
    index k1*k2 (kmeans_quantize.py:158-160);
  * a root's active leaf count comes from iLeafSubNum (set by the
    pseudo-label preprocessing), extra slots never win the argmin;
  * Lloyd iterations recompute centers from one-hot sums; empty clusters
    collapse to ~0 exactly like the reference's 1e-6-count division;
  * quantization uses the straight-through estimator
    q = feat - stop_grad(feat) + centers[ids] (kmeans_quantize.py:273-275);
  * non-assign steps do NOT move centers: the reference's `update_centers`
    computes means into a local that is never written back
    (kmeans_quantize.py:58-78), so the effective behavior is "quantize with
    cached centers/ids" — replicated here by simply reusing the state.

TPU-first differences: the chunked cdist loops become one
dist^2 = |x|^2 - 2 x c^T + |c|^2 matmul on the MXU; the equalize-cluster-size
padding machinery (kmeans_quantize.py:89-144) is unnecessary — center updates
are a one-hot matmul; dead (padding) splats carry zero weight.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class KMeansState(NamedTuple):
    centers: jnp.ndarray  # [k1, 9] coarse centers
    cls_ids: jnp.ndarray  # [N] int32 coarse assignment
    leaf_centers: jnp.ndarray  # [k1*k2+1, 6]
    leaf_cls_ids: jnp.ndarray  # [N] int32 fine assignment
    leaf_sub_num: jnp.ndarray  # [k1] int32 active leaves per root (iLeafSubNum)

    @staticmethod
    def create(n: int, k1: int, k2: int, dim: int = 6, pos_dim: int = 3) -> "KMeansState":
        return KMeansState(
            centers=jnp.zeros((k1, dim + pos_dim), jnp.float32),
            cls_ids=jnp.zeros((n,), jnp.int32),
            leaf_centers=jnp.zeros((k1 * k2 + 1, dim), jnp.float32),
            # all points start in the "unassigned" bucket k1*k2
            leaf_cls_ids=jnp.full((n,), k1 * k2, jnp.int32),
            leaf_sub_num=jnp.full((k1,), k2, jnp.int32),
        )


def _dist2(x, c):
    """[N,D] x [K,D] -> squared distances [N,K] via the MXU."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(c * c, axis=-1)
    return x2 - 2.0 * jnp.dot(x, c.T, preferred_element_type=jnp.float32) + c2[None, :]


def _lloyd(feat, weight, centers, iters: int):
    """weight [N] in {0,1}: dead splats don't pull centers. Returns
    (centers, ids)."""
    k = centers.shape[0]

    def body(_, c):
        d = _dist2(feat, c)
        ids = jnp.argmin(d, axis=-1)
        onehot = (ids[:, None] == jnp.arange(k)[None, :]).astype(jnp.float32)
        onehot = onehot * weight[:, None]
        sums = jnp.dot(onehot.T, feat, preferred_element_type=jnp.float32)
        counts = onehot.sum(axis=0) + 1e-6
        return sums / counts[:, None]

    centers = jax.lax.fori_loop(0, iters, body, centers)
    ids = jnp.argmin(_dist2(feat, centers), axis=-1).astype(jnp.int32)
    return centers, ids


def init_centers_from_points(feat: jnp.ndarray, weight: jnp.ndarray, k: int, key) -> jnp.ndarray:
    """k-means++ init over alive points.

    The reference seeds with uniformly random points
    (kmeans_quantize.py:156-159), which routinely drops two seeds into one
    cluster and Lloyd cannot recover (a measured failure at small k). D^2
    sampling is a strict quality improvement with identical output contract.
    """
    n = feat.shape[0]
    k0, key = jax.random.split(key)
    p0 = weight / jnp.maximum(weight.sum(), 1.0)
    first = feat[jax.random.choice(k0, n, p=p0)]
    centers0 = jnp.zeros((k, feat.shape[1]), feat.dtype).at[0].set(first)
    d0 = jnp.sum((feat - first) ** 2, axis=-1) * weight

    def body(i, carry):
        centers, d2, key = carry
        key, kk = jax.random.split(key)
        p = d2 / jnp.maximum(d2.sum(), 1e-12)
        nxt = feat[jax.random.choice(kk, n, p=p)]
        centers = centers.at[i].set(nxt)
        d2 = jnp.minimum(d2, jnp.sum((feat - nxt) ** 2, axis=-1) * weight)
        return centers, d2, key

    centers, _, _ = jax.lax.fori_loop(1, k, body, (centers0, d0, key))
    return centers


def match_labels(centers, ref_centers):
    """Greedy bijective matching of `centers` onto `ref_centers` (closest
    pairs first). Returns (perm, inv): new cluster i takes ref label perm[i];
    centers[inv] is the center table reordered to ref labels."""
    k = centers.shape[0]
    cost0 = _dist2(centers, ref_centers)  # [k_new, k_ref]

    def step(_, carry):
        cost, perm = carry
        flat = jnp.argmin(cost)
        i, j = flat // k, flat % k
        perm = perm.at[i].set(j)
        cost = cost.at[i, :].set(jnp.inf).at[:, j].set(jnp.inf)
        return cost, perm

    _, perm = jax.lax.fori_loop(0, k, step, (cost0, jnp.zeros((k,), jnp.int32)))
    inv = jnp.zeros((k,), jnp.int32).at[perm].set(jnp.arange(k, dtype=jnp.int32))
    return perm, inv


def _align_labels(centers, ids, ref_centers):
    """Relabel `centers`/`ids` onto `ref_centers` labels via match_labels."""
    perm, inv = match_labels(centers, ref_centers)
    return centers[inv], perm[ids].astype(jnp.int32)


def assign_root(
    state: KMeansState,
    ins_feat: jnp.ndarray,  # [N,6] raw (un-normalized) features
    xyz: jnp.ndarray,  # [N,3]
    alive: jnp.ndarray,  # [N] bool
    pos_weight: float,
    key,
    iters: int = 5,
    init: bool = False,
) -> KMeansState:
    feat = jnp.concatenate([ins_feat, xyz * pos_weight], axis=-1)
    feat = jax.lax.stop_gradient(feat)
    # Dead rows can hold NaN (densification surgery); IEEE 0 * NaN = NaN
    # would poison every center through the weighted one-hot matmul, so
    # they are zeroed (weights already exclude them from the means).
    feat = jnp.where(alive[:, None], feat, 0.0)
    w = alive.astype(jnp.float32)

    def run(centers0):
        centers, ids = _lloyd(feat, w, centers0, iters)
        d = _dist2(feat, centers)
        err = jnp.sum(jnp.take_along_axis(d, ids[:, None], axis=1)[:, 0] * w)
        return centers, ids, err

    fresh = init_centers_from_points(feat, w, state.centers.shape[0], key)
    c1, i1, e1 = run(fresh)
    if init:
        centers, ids = c1, i1
    else:
        # Lloyd from cached centers tracks the drifting features (reference
        # behavior), but it cannot escape a bad basin (e.g. two clusters
        # merged while another splits — a measured failure). Each reassign
        # also tries a fresh k-means++ restart and keeps whichever
        # clustering quantizes better. Cluster LABELS are load-bearing
        # between reassignments (leaf codebooks, pseudo visibility, and the
        # stage-2.2 round-robin are keyed by root id), so the restart is
        # relabeled by greedy center matching against the cached labels.
        c2, i2, e2 = run(state.centers)
        c1, i1 = _align_labels(c1, i1, state.centers)
        better = e1 < e2
        centers = jnp.where(better, c1, c2)
        ids = jnp.where(better, i1, i2)
    return state._replace(centers=centers, cls_ids=ids)


def assign_leaf(
    state: KMeansState,
    ins_feat: jnp.ndarray,  # [N,6]
    alive: jnp.ndarray,
    selected_root,  # traced int scalar
    key,
    k2: int,
    iters: int = 5,
    init: bool = False,
) -> KMeansState:
    """Re-cluster the 6-D features of one root's points into its k2 slots
    (kmeans_quantize.py:195-206, 232-241). Slots beyond the root's active
    leaf count (leaf_sub_num) are masked out of the argmin."""
    feat = jax.lax.stop_gradient(ins_feat)
    feat = jnp.where(alive[:, None], feat, 0.0)  # see assign_root
    member = (state.cls_ids == selected_root) & alive
    w = member.astype(jnp.float32)
    start = selected_root * k2
    n_sub = state.leaf_sub_num[selected_root]

    local = jax.lax.dynamic_slice_in_dim(state.leaf_centers, start, k2, axis=0)
    if init:
        local = init_centers_from_points(feat, w + 1e-9, k2, key)
    slot_ok = jnp.arange(k2) < n_sub

    def body(_, c):
        d = jnp.where(slot_ok[None, :], _dist2(feat, c), jnp.inf)
        ids = jnp.argmin(d, axis=-1)
        onehot = (ids[:, None] == jnp.arange(k2)[None, :]).astype(jnp.float32)
        onehot = onehot * w[:, None]
        sums = jnp.dot(onehot.T, feat, preferred_element_type=jnp.float32)
        counts = onehot.sum(axis=0) + 1e-6
        new_c = sums / counts[:, None]
        return jnp.where(slot_ok[:, None], new_c, c)

    local = jax.lax.fori_loop(0, iters, body, local)
    ids = jnp.argmin(
        jnp.where(slot_ok[None, :], _dist2(feat, local), jnp.inf), axis=-1
    ).astype(jnp.int32)

    leaf_centers = jax.lax.dynamic_update_slice_in_dim(
        state.leaf_centers, local, start, axis=0
    )
    leaf_ids = jnp.where(member, ids + start, state.leaf_cls_ids)
    return state._replace(leaf_centers=leaf_centers, leaf_cls_ids=leaf_ids)


def quantize(state: KMeansState, ins_feat: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Straight-through quantized features [N, 6]."""
    if mode == "root":
        sampled = state.centers[state.cls_ids][:, :6]
    else:
        sampled = state.leaf_centers[state.leaf_cls_ids]
    return ins_feat - jax.lax.stop_gradient(ins_feat) + jax.lax.stop_gradient(sampled)
