"""Gaussian-sharded k-means codebook updates (shard_map + psum).

Net-new relative to the single-GPU reference (SURVEY.md §2.3); the
single-device semantics live in ops/kmeans.py (reference
scene/kmeans_quantize.py). Sharded design:

  * features [N, D] stay sharded over the `dev` axis — the O(N·k·D)
    distance matmuls and one-hot reductions run on each device's N/d rows;
  * Lloyd center updates psum the per-cluster feature sums and counts over
    the mesh, so every device holds identical (replicated) centers;
  * k-means++ seeding draws a fixed-size weighted subsample per shard,
    all_gathers the pool (a few thousand rows — negligible traffic), and
    runs the D^2 sampling replicated on the pool;
  * the reassign path mirrors ops/kmeans.assign_root: Lloyd from the cached
    centers AND from a fresh k-means++ restart, keep whichever quantizes
    better (global psum'd error), with the restart's labels greedily
    aligned to the cached centers (root ids are load-bearing).

Assignments come back sharded like the inputs; `ops.kmeans.quantize`
works unchanged on sharded ids (centers are replicated).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from opengaussian_tpu.ops.kmeans import KMeansState, _dist2, match_labels


def _lloyd_sharded(feat_l, w_l, centers, iters: int, axis: str):
    """Local shard [n_l, D] + replicated centers -> (centers, local ids).
    Center updates are global via psum."""
    k = centers.shape[0]

    def body(_, c):
        d = _dist2(feat_l, c)
        ids = jnp.argmin(d, axis=-1)
        onehot = (ids[:, None] == jnp.arange(k)[None, :]).astype(jnp.float32)
        onehot = onehot * w_l[:, None]
        sums = jnp.dot(onehot.T, feat_l, preferred_element_type=jnp.float32)
        counts = onehot.sum(axis=0)
        sums = jax.lax.psum(sums, axis)
        counts = jax.lax.psum(counts, axis)
        return sums / (counts + 1e-6)[:, None]

    centers = jax.lax.fori_loop(0, iters, body, centers)
    ids = jnp.argmin(_dist2(feat_l, centers), axis=-1).astype(jnp.int32)
    return centers, ids


def _init_pool(feat_l, w_l, key, sample_per_shard: int, axis: str):
    """Weighted per-shard subsample, gathered to a replicated seed pool."""
    r = jax.lax.axis_index(axis)
    kk = jax.random.fold_in(key, r)
    n_l = feat_l.shape[0]
    p = (w_l + 1e-9) / jnp.sum(w_l + 1e-9)
    idx = jax.random.choice(kk, n_l, (sample_per_shard,), replace=True, p=p)
    pool = jax.lax.all_gather(feat_l[idx], axis, axis=0, tiled=True)
    pool_w = jax.lax.all_gather(w_l[idx], axis, axis=0, tiled=True)
    return pool, pool_w


def assign_root_sharded(
    mesh: Mesh,
    state: KMeansState,
    ins_feat,  # [N,6] sharded over axis
    xyz,  # [N,3] sharded
    alive,  # [N] bool sharded
    pos_weight: float,
    key,
    iters: int = 5,
    init: bool = False,
    axis: str = "dev",
    sample_per_shard: int = 1024,
) -> KMeansState:
    """Sharded twin of ops.kmeans.assign_root. Returns centers replicated,
    cls_ids sharded like the inputs."""
    from opengaussian_tpu.ops.kmeans import init_centers_from_points

    k = state.centers.shape[0]

    def local(centers_cached, feat_l, xyz_l, alive_l, key):
        f = jnp.concatenate([feat_l, xyz_l * pos_weight], axis=-1)
        f = jax.lax.stop_gradient(f)
        f = jnp.where(alive_l[:, None], f, 0.0)  # NaN-proof dead rows
        w = alive_l.astype(jnp.float32)

        pool, pool_w = _init_pool(f, w, key, sample_per_shard, axis)
        fresh = init_centers_from_points(pool, pool_w, k, key)  # replicated

        def run(c0):
            c, ids = _lloyd_sharded(f, w, c0, iters, axis)
            d = _dist2(f, c)
            err_l = jnp.sum(jnp.take_along_axis(d, ids[:, None], axis=1)[:, 0] * w)
            return c, ids, jax.lax.psum(err_l, axis)

        c1, i1, e1 = run(fresh)
        if init:
            return c1, i1
        c2, i2, e2 = run(centers_cached)
        perm, inv = match_labels(c1, centers_cached)  # replicated
        c1, i1 = c1[inv], perm[i1].astype(jnp.int32)
        better = e1 < e2
        return jnp.where(better, c1, c2), jnp.where(better, i1, i2)

    pspec = P(axis)
    centers, ids = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), pspec, pspec, pspec, P()),
        out_specs=(P(), pspec),
        check_vma=False,
    )(state.centers, ins_feat, xyz, alive, key)
    return state._replace(centers=centers, cls_ids=ids)


def assign_leaf_sharded(
    mesh: Mesh,
    state: KMeansState,
    ins_feat,  # [N,6] sharded
    alive,  # [N] sharded
    selected_root,
    key,
    k2: int,
    iters: int = 5,
    init: bool = False,
    axis: str = "dev",
    sample_per_shard: int = 512,
) -> KMeansState:
    """Sharded twin of ops.kmeans.assign_leaf: re-cluster one root's points
    into its k2 slots, slots past leaf_sub_num masked out of the argmin."""
    from opengaussian_tpu.ops.kmeans import init_centers_from_points

    def local(leaf_centers, cls_ids_l, leaf_ids_l, leaf_sub_num, sel_root,
              feat_l, alive_l, key):
        f = jax.lax.stop_gradient(feat_l)
        f = jnp.where(alive_l[:, None], f, 0.0)
        member = (cls_ids_l == sel_root) & alive_l
        w = member.astype(jnp.float32)
        start = sel_root * k2
        n_sub = leaf_sub_num[sel_root]
        slot_ok = jnp.arange(k2) < n_sub

        local_c = jax.lax.dynamic_slice_in_dim(leaf_centers, start, k2, axis=0)
        if init:
            pool, pool_w = _init_pool(f, w + 1e-9, key, sample_per_shard, axis)
            local_c = init_centers_from_points(pool, pool_w, k2, key)

        def body(_, c):
            d = jnp.where(slot_ok[None, :], _dist2(f, c), jnp.inf)
            ids = jnp.argmin(d, axis=-1)
            onehot = (ids[:, None] == jnp.arange(k2)[None, :]).astype(jnp.float32)
            onehot = onehot * w[:, None]
            sums = jax.lax.psum(
                jnp.dot(onehot.T, f, preferred_element_type=jnp.float32), axis
            )
            counts = jax.lax.psum(onehot.sum(axis=0), axis)
            new_c = sums / (counts + 1e-6)[:, None]
            return jnp.where(slot_ok[:, None], new_c, c)

        local_c = jax.lax.fori_loop(0, iters, body, local_c)
        ids = jnp.argmin(
            jnp.where(slot_ok[None, :], _dist2(f, local_c), jnp.inf), axis=-1
        ).astype(jnp.int32)
        leaf_centers = jax.lax.dynamic_update_slice_in_dim(
            leaf_centers, local_c, start, axis=0
        )
        new_leaf_ids = jnp.where(member, ids + start, leaf_ids_l)
        return leaf_centers, new_leaf_ids

    pspec = P(axis)
    leaf_centers, leaf_ids = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), pspec, pspec, P(), P(), pspec, pspec, P()),
        out_specs=(P(), pspec),
        check_vma=False,
    )(state.leaf_centers, state.cls_ids, state.leaf_cls_ids, state.leaf_sub_num,
      jnp.asarray(selected_root, jnp.int32), ins_feat, alive, key)
    return state._replace(leaf_centers=leaf_centers, leaf_cls_ids=leaf_ids)
