"""Tile binning: splat -> (tile, depth)-sorted intersection lists.

TPU-native replacement for the CUDA rasterizer's duplication + radix-sort +
tile-range identification stages (SURVEY.md §2.1). Everything is static-shape:

  * duplication uses a fixed intersection budget P_max. The classic
    "scatter segment starts, then cumulative-max" trick expands each splat
    into one slot per touched tile without dynamic shapes.
  * the (tile_id, depth) key sort is a stable two-key jax.lax.sort, which XLA
    lowers to its native TPU sort.
  * per-tile ranges come from searchsorted over the sorted tile ids, gathered
    into a dense [num_tiles, K_max] index matrix (front-to-back order, the
    farthest splats of an over-full tile are truncated).

All integer plumbing; not differentiated.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.ops.projection import Projected


class TileBins(NamedTuple):
    gauss_idx: jnp.ndarray  # [T, K_max] int32 splat index per slot (front-to-back)
    counts: jnp.ndarray  # [T] int32 valid entries per tile (<= K_max)
    total: jnp.ndarray  # [] int32 total intersections before budgeting
    n_dropped: jnp.ndarray  # [] int32 intersections lost to P_max
    n_truncated: jnp.ndarray  # [] int32 intersections lost to K_max
    # plumbing for the backward's collision-free gradient reduction:
    # original slots are per-splat contiguous, so per-splat gradient sums
    # become a sorted segment-sum after one unique gather from the dense
    # [T, K] layout.
    slot_dense_pos: jnp.ndarray  # [P] int32 original slot -> t*K + k
    slot_gauss: jnp.ndarray  # [P] int32 splat per original slot
    slot_ok: jnp.ndarray  # [P] bool (valid and not truncated)


def bin_gaussians(
    proj: Projected, grid_x: int, grid_y: int, max_intersections: int, max_per_tile: int
) -> TileBins:
    num_tiles = grid_x * grid_y
    P = max_intersections
    K = max_per_tile

    nt = jax.lax.stop_gradient(proj.num_tiles)
    depth = jax.lax.stop_gradient(proj.depth)
    rect_min = proj.rect_min
    rect_w = jnp.maximum(proj.rect_max[:, 0] - rect_min[:, 0], 1)

    starts = jnp.cumsum(nt) - nt  # exclusive prefix sum
    total = jnp.sum(nt)
    n = nt.shape[0]

    # Fused single-int32 sort key: tiles get the high bits, the splat's rank
    # in a global depth order the low bits. The depth-rank trick keeps the
    # (tile, depth) order EXACT (ranks are unique; stable rank order equals
    # stable depth order) while sorting one int key instead of a two-key
    # (int, float) pair. Falls back to the two-key sort when the bit budget
    # doesn't fit (very large N x many tiles).
    bits_tile = max(int(np.ceil(np.log2(num_tiles + 2))), 1)
    bits_rank = max(int(np.ceil(np.log2(n + 1))), 1)
    fused = bits_tile + bits_rank <= 31

    # Expand: mark each splat's first slot with (index+1), cummax fills the
    # rest of its segment. Splats with nt == 0 never scatter.
    gidx1 = jnp.where((nt > 0) & (starts < P), jnp.arange(n, dtype=jnp.int32) + 1, 0)
    start_clip = jnp.minimum(starts, P - 1)
    seg = jnp.zeros((P,), jnp.int32).at[start_clip].max(gidx1)
    g = jax.lax.cummax(seg) - 1  # [P] splat index per slot (-1 before first)
    slot = jnp.arange(P, dtype=jnp.int32)
    slot_valid = (slot < total) & (g >= 0)
    g_safe = jnp.maximum(g, 0)

    r = slot - starts[g_safe]  # local tile rank within the splat's rect
    w = rect_w[g_safe]
    tx = rect_min[g_safe, 0] + r % w
    ty = rect_min[g_safe, 1] + r // w
    tile_id = jnp.where(slot_valid, ty * grid_x + tx, num_tiles)

    if fused:
        order = jnp.argsort(depth, stable=True)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        key = (tile_id << bits_rank) | rank[g_safe]
        key_s, g_sorted = jax.lax.sort(
            (key, g_safe.astype(jnp.int32)), num_keys=1, is_stable=False
        )
        tile_s = key_s >> bits_rank
        # keys are unique -> exact sorted position by binary search
        slot_pos = jnp.searchsorted(key_s, key).astype(jnp.int32)
    else:
        # stable two-key sort: tile major, depth minor; carry the original
        # slot id to recover each slot's sorted position
        slot_ids = jnp.arange(P, dtype=jnp.int32)
        tile_s, _, g_sorted, slot_sorted = jax.lax.sort(
            (tile_id, depth[g_safe], g_safe.astype(jnp.int32), slot_ids),
            num_keys=2,
            is_stable=True,
        )
        slot_pos = jnp.zeros((P,), jnp.int32).at[slot_sorted].set(slot_ids)

    # per-tile ranges + dense gather matrix
    tstart = jnp.searchsorted(tile_s, jnp.arange(num_tiles, dtype=jnp.int32), side="left")
    tend = jnp.searchsorted(
        tile_s, jnp.arange(num_tiles, dtype=jnp.int32), side="right"
    )
    full_counts = tend - tstart
    counts = jnp.minimum(full_counts, K)
    gather = tstart[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    in_range = gather < tend[:, None]
    gather = jnp.minimum(gather, P - 1)
    gauss_idx = jnp.where(in_range, g_sorted[gather], 0)

    n_dropped = total - jnp.sum(slot_valid.astype(jnp.int32))
    n_truncated = jnp.sum(full_counts - counts)

    tile_clip = jnp.minimum(tile_id, num_tiles - 1)
    k_of_slot = slot_pos - tstart[tile_clip]
    slot_ok = slot_valid & (k_of_slot < K) & (tile_id < num_tiles)
    slot_dense_pos = jnp.where(
        slot_ok, tile_clip * K + jnp.clip(k_of_slot, 0, K - 1), 0
    )
    return TileBins(
        gauss_idx=gauss_idx.astype(jnp.int32),
        counts=counts.astype(jnp.int32),
        total=total,
        n_dropped=n_dropped,
        n_truncated=n_truncated,
        slot_dense_pos=slot_dense_pos.astype(jnp.int32),
        slot_gauss=g_safe.astype(jnp.int32),
        slot_ok=slot_ok,
    )
