"""Tile binning: splat -> (tile, depth)-sorted intersection lists.

TPU-native replacement for the CUDA rasterizer's duplication + radix-sort +
tile-range identification stages (SURVEY.md §2.1). Everything is static-shape:

  * duplication uses a fixed intersection budget P_max. The classic
    "scatter segment starts, then cumulative-max" trick expands each splat
    into one slot per touched tile without dynamic shapes.
  * the (tile_id, depth) key sort fuses tile id and a global depth rank into
    ONE int32 key where the bit budget allows, and falls back to a stable
    two-key jax.lax.sort otherwise. XLA lowers both to its native TPU sort.
  * per-tile ranges come from searchsorted over the sorted tile ids with only
    `num_tiles` queries (a few thousand) — measured on v5e, a 1.6M-query
    searchsorted costs >200 ms while the whole sort costs ~2 ms, so all
    per-slot bookkeeping here is vector math over the *sorted* stream and the
    backward's gradient reduction consumes sorted-order slots directly.

All integer plumbing; not differentiated.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.ops.projection import TILE, Projected


class TileBins(NamedTuple):
    gauss_idx: jnp.ndarray | None  # [T, K_max] int32 splat index per slot
    # (front-to-back; dense layout for the XLA scan blend / vmapped renders)
    counts: jnp.ndarray  # [T] int32 valid entries per tile (<= K_max).
    # Under tile WINDOWING (window_depth > 0) the tile axis of counts /
    # tile_start is VIRTUAL: a real tile deeper than K_max occupies several
    # consecutive virtual tiles of <= K_max slots each; vt_* map them back.
    total: jnp.ndarray  # [] int32 total intersections before budgeting
    n_dropped: jnp.ndarray  # [] int32 intersections lost to P_max
    n_truncated: jnp.ndarray  # [] int32 intersections lost to K_max (or,
    # windowed, to the window_depth / window budget)
    max_intersections: int  # static P budget (drives the backward's
    # chunk-compaction size; see rasterize_pallas._pallas_bwd)
    tile_start: jnp.ndarray | None = None  # [T] int32 offset of each tile's
    # run in the sorted stream (stream layout for the Pallas kernels)
    sorted_gauss: jnp.ndarray | None = None  # [P] int32 splat index per
    # sorted slot ((tile, depth) order; tiles are contiguous runs)
    sorted_carry: jnp.ndarray | None = None  # [P, D] f32: the caller's
    # `carry` table rows in sorted-slot order (see below)
    vt_real: jnp.ndarray | None = None  # [Tv] int32 REAL tile index (band-
    # relative) of each virtual tile; feeds the kernels' pixel-coord table
    vt_first: jnp.ndarray | None = None  # [band] int32 first virtual tile
    # of each real tile
    vt_n: jnp.ndarray | None = None  # [band] int32 window count per real
    # tile (windows compose by (a,T)(a',T') = (a+T a', T T') — see
    # rasterize._fold_windows)


def depth_rank(depth: jnp.ndarray) -> jnp.ndarray:
    """Global depth rank (unique, stable): the sort key minor part. Rank
    depends ONLY on depth, so group renders sharing one projection compute
    it once and pass it to every per-group bin_gaussians (the [N] argsort
    measured ~1.5 ms at 200k splats — repeated k1*k2 times per lang-sweep
    view before the hoist)."""
    order = jnp.argsort(depth, stable=True)
    n = depth.shape[0]
    return jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))


def bin_gaussians(
    proj: Projected, grid_x: int, grid_y: int, max_intersections: int,
    max_per_tile: int, tile_lo: int = 0, tile_hi: int | None = None,
    dense: bool = True, stream: bool = False,
    carry: jnp.ndarray | None = None, band_size: int | None = None,
    window_depth: int = 0, window_extra: int = 0,
    rank: jnp.ndarray | None = None,
    group_of: jnp.ndarray | None = None, num_groups: int = 1,
) -> TileBins:
    """tile_lo/tile_hi restrict the per-tile outputs (gauss_idx, counts,
    tile_start) to the tile range [tile_lo, tile_hi) — used by banded
    rendering to bound the dense per-tile memory for very large images; the
    per-slot stream still covers the full frame.

    band_size: the sharded-render form of the same restriction — tile_lo
    may then be a TRACED offset (jax.lax.axis_index arithmetic) while the
    band's extent stays static for shapes; tile_hi is derived. Callers pair
    it with projection.clip_rect_rows so the per-slot stream too holds only
    the band's rows. Padded tile ids beyond the real grid (the mesh rounds
    T up to a device multiple) report count 0: the sort's invalid-slot
    sentinel id equals the REAL tile count, which would otherwise land
    inside the last device's band.

    window_depth (stream layout only): S > 0 splits any tile deeper than K
    into up to S consecutive VIRTUAL tiles of <= K slots each (counts /
    tile_start become virtual; vt_real / vt_first / vt_n map back), so K
    can stay at a shallow compile-friendly window while arbitrarily deep
    tiles blend exactly — the composite is folded outside the kernel
    (rasterize._fold_windows). Deep per-tile budgets measured a compile
    cliff on v5e (K=1472 takes >6x the K=576 Mosaic compile and trips the
    scoped-VMEM limit at K~2000), and every tile's stream DMA moves a full
    K-row window regardless of its live count, so shallow K is also less
    DMA. Slots beyond S*K per tile, or windows beyond the Tv = band +
    window_extra budget (window_extra=0 means the hard bound P//K, which
    can never overflow), are counted in n_truncated exactly like the old
    K-truncation.

    dense=True scatters the sorted stream into the [T, K] gauss_idx matrix
    (XLA scan blend and vmapped group renders need it). stream=True returns
    the sorted stream itself (sorted_gauss + tile_start) for the Pallas
    kernels, which DMA each tile's contiguous run directly — skipping both
    the dense scatter (~6.3 ms at 850k slots on v5e) and the [T, K, F]
    row-gather (~10 ms) of the dense formulation.

    carry [N, D] f32: per-splat columns to deliver in SORTED-slot order
    (returned as TileBins.sorted_carry, a [P, D] matrix). Delivered by ONE
    post-sort row gather carry[g_sorted] from the [N, D] table — NOT by
    riding the sort as value operands. In isolation the sort is
    key-dominated (~2 ms at 850k regardless of payload width) and the r2
    design rode the carry through it; in a full training step the
    15-operand sort costs ~15.7 ms (tools/bin_bisect.py: layout
    copies/rematerialization around the barrier that the 2-operand sort
    avoids), while sort(key, g) + one [P, D] row gather from [N, D]
    measures ~7.5 ms cheaper in context AND shrinks the expansion pack
    gather/transpose from 19 to 8 columns.

    group_of [N] int32 + num_groups = G > 1 (PARTITION binning, stream
    only): each splat's slots land in the VIRTUAL tile group_of[i] *
    num_tiles + tile, so G DISJOINT groups (a cluster partition) bin /
    sort / range in ONE pass — counts/tile_start span G * num_tiles
    virtual tiles and one kernel launch blends every group (the per-group
    scan alternative pays ~4.6 ms of fixed per-render latency per group at
    the recipe shape — rasterize.rasterize_partition). Splats outside
    every group must carry num_tiles == 0 (mask their opacities in proj)."""
    num_tiles = grid_x * grid_y
    vt_total = num_tiles * num_groups
    if group_of is not None:
        assert stream and not dense, "partition binning is stream-only"
        assert tile_lo == 0 and tile_hi is None and band_size is None, (
            "partition binning does not compose with tile bands")
    if band_size is not None:
        band = band_size
        tile_hi = tile_lo + band_size
    else:
        if tile_hi is None:
            tile_hi = vt_total
        band = tile_hi - tile_lo
    P = max_intersections
    K = max_per_tile

    nt = jax.lax.stop_gradient(proj.num_tiles)
    depth = jax.lax.stop_gradient(proj.depth)
    rect_min = proj.rect_min
    rect_w = jnp.maximum(proj.rect_max[:, 0] - rect_min[:, 0], 1)

    starts = jnp.cumsum(nt) - nt  # exclusive prefix sum
    total = jnp.sum(nt)
    n = nt.shape[0]

    # Expand: mark each splat's first slot with (index+1), cummax fills the
    # rest of its segment. Splats with nt == 0 never scatter.
    gidx1 = jnp.where((nt > 0) & (starts < P), jnp.arange(n, dtype=jnp.int32) + 1, 0)
    start_clip = jnp.minimum(starts, P - 1)
    seg = jnp.zeros((P,), jnp.int32).at[start_clip].max(gidx1)
    g = jax.lax.cummax(seg) - 1  # [P] splat index per slot (-1 before first)
    slot = jnp.arange(P, dtype=jnp.int32)
    slot_valid = (slot < total) & (g >= 0)
    g_safe = jnp.maximum(g, 0)

    # Global depth rank: ranks are unique, so ordering by rank within a tile
    # equals stable ordering by depth. Sorting (tile << bits) | rank as one
    # int32 key is exact and fast when the bits fit.
    if rank is None:
        rank = depth_rank(depth)

    # ONE packed row-gather for all per-slot splat attributes (a v5e scalar
    # gather costs about as much as a row gather, so 8 separate [P] gathers
    # would be ~8x slower). The f32 lanes are exact only below 2^24: starts
    # ranges up to P and rank up to n, so very large budgets (P or n >= 16M,
    # i.e. multi-million-splat scenes with 8x duplication) fall back to an
    # extra int32 row-gather for those two lanes rather than silently
    # rounding tile coordinates.
    exact_f32 = P < 2**24 and n < 2**24
    lanes = [
        starts.astype(jnp.float32),
        rect_min[:, 0].astype(jnp.float32),
        rect_min[:, 1].astype(jnp.float32),
        rect_w.astype(jnp.float32),
        rank.astype(jnp.float32),
        jax.lax.stop_gradient(proj.mean2d[:, 0]),
        jax.lax.stop_gradient(proj.mean2d[:, 1]),
        proj.cull_radius,
    ]
    if group_of is not None:
        # one extra exact-f32 lane: the slot's group offset rides the same
        # single row-gather as everything else
        lanes.append(jnp.clip(group_of, 0, num_groups - 1)
                     .astype(jnp.float32))
    pack = jnp.stack(lanes, axis=-1)  # [N, 8(+1)]
    pk = pack[g_safe]  # [P, 8] — expansion order: indices ascend
    # ONE transpose to [8, P] so every lane below is a CONTIGUOUS [P] vector:
    # column slices of the (8,128)-tiled [P, 8] layout are strided reads the
    # XLA cost model prices at ~5 ms per consumer fusion at P=850k (~14 ms
    # of the binning total); the single relayout replaces them all.
    pkT = jax.lax.optimization_barrier(pk.T)  # [8, P], forced materialized
    if exact_f32:
        starts_slot = pkT[0].astype(jnp.int32)
        rank_slot = pkT[4].astype(jnp.int32)
    else:
        ipack = jnp.stack([starts, rank], axis=-1)[g_safe]  # [P, 2] int32
        starts_slot = ipack[:, 0]
        rank_slot = ipack[:, 1]
    r = (slot - starts_slot).astype(jnp.float32)
    w = pkT[3]
    # exact integer div/mod via f32 reciprocal + one correction step —
    # s32 div/mod lower to a slow scalar sequence on the VPU (measured
    # ~15 ms per 1.6M-element fusion, vs ~2 ms for this).
    q = jnp.floor(r * (1.0 / w))
    rem = r - q * w
    q = q + (rem >= w).astype(jnp.float32) - (rem < 0).astype(jnp.float32)
    rem = r - q * w
    tx = (pkT[1] + rem).astype(jnp.int32)
    ty = (pkT[2] + q).astype(jnp.int32)

    # Exact circle-tile cull: the splat's cutoff radius (opacity-aware when
    # tight_radius is on) already guarantees alpha < 1/255 beyond it, so a
    # tile whose nearest point to the center is farther than the radius
    # receives exactly zero contribution — the classic bbox expansion wastes
    # ~20% of its slots on such corner tiles. Distances to pixel centers are
    # >= distances to the tile rect, so the test is conservative-exact.
    TILE_F = float(TILE)
    cx = pkT[5]
    cy = pkT[6]
    nx = jnp.clip(cx, tx.astype(jnp.float32) * TILE_F,
                  tx.astype(jnp.float32) * TILE_F + (TILE_F - 1.0))
    ny = jnp.clip(cy, ty.astype(jnp.float32) * TILE_F,
                  ty.astype(jnp.float32) * TILE_F + (TILE_F - 1.0))
    rad = pkT[7]
    hits = (cx - nx) ** 2 + (cy - ny) ** 2 <= rad * rad
    tid = ty * grid_x + tx
    if group_of is not None:
        tid = tid + pkT[8].astype(jnp.int32) * num_tiles
    tile_id = jnp.where(slot_valid & hits, tid, vt_total)

    # sort ONLY (key, splat index); the carry rows are row-gathered from the
    # per-splat table afterwards (see `carry` in the docstring)
    bits_tile = max(int(np.ceil(np.log2(vt_total + 2))), 1)
    bits_rank = max(int(np.ceil(np.log2(n + 1))), 1)
    if bits_tile + bits_rank <= 31:
        key = (tile_id << bits_rank) | rank_slot
        out = jax.lax.sort(
            (key, g_safe.astype(jnp.int32)), num_keys=1, is_stable=False,
        )
        # barrier: without it XLA runs the sort twice (once for the counts
        # chain, once for the scatter chain)
        out = jax.lax.optimization_barrier(out)
        key_s, g_sorted = out
        tile_s = key_s >> bits_rank
    else:
        # stable two-key int sort: tile major, depth rank minor
        out = jax.lax.sort(
            (tile_id, rank_slot, g_safe.astype(jnp.int32)),
            num_keys=2,
            is_stable=False,  # keys are unique as a pair
        )
        out = jax.lax.optimization_barrier(out)
        tile_s, g_sorted = out[0], out[2]
    sorted_carry = carry[g_sorted] if carry is not None else None  # [P, D]

    # per-tile ranges (band queries only). NOTE: a scatter-max of
    # (k_of_slot + 1) over the band looks cheaper than a searchsorted call
    # but measures 6 ms SLOWER on v5e at ~850k slots — XLA's int scatter is
    # the bottleneck, not the log2(P) probes. One (band+1)-query searchsorted
    # gives both edges: the end of tile t's run is the start of tile t+1's
    # (ids are sorted, so side="right" at t == side="left" at t+1).
    band_ids = tile_lo + jnp.arange(band + 1, dtype=jnp.int32)
    edges = jnp.searchsorted(tile_s, band_ids, side="left")
    tstart = edges[:-1]
    full_counts = edges[1:] - tstart
    # a band reaching past the real grid (mesh padding) must not pick up
    # the invalid-slot sentinel run at id == vt_total (== num_tiles when
    # ungrouped)
    full_counts = jnp.where(band_ids[:-1] < vt_total, full_counts, 0)
    counts = jnp.minimum(full_counts, K)

    n_dropped = total - jnp.sum(slot_valid.astype(jnp.int32))
    n_truncated = jnp.sum(full_counts - counts)

    vt_real = vt_first = vt_n = None
    if window_depth > 0 and stream:
        S = window_depth
        nwin = jnp.clip((full_counts + K - 1) // K, 1, S)
        covered = jnp.minimum(full_counts, nwin * K)
        extra = window_extra if window_extra else max(P // K, 1)
        Tv = band + extra
        vt_first = jnp.cumsum(nwin) - nwin  # [band]
        total_w = vt_first[-1] + nwin[-1]
        # same scatter+cummax expansion as the splat->slot expansion above
        tmark = jnp.where(vt_first < Tv,
                          jnp.arange(band, dtype=jnp.int32) + 1, 0)
        seg_v = jnp.zeros((Tv,), jnp.int32).at[
            jnp.minimum(vt_first, Tv - 1)].max(tmark)
        vt_real = jnp.maximum(jax.lax.cummax(seg_v) - 1, 0)  # [Tv]
        vslot = jnp.arange(Tv, dtype=jnp.int32)
        w = vslot - vt_first[vt_real]
        live_v = (vslot < total_w) & (w < nwin[vt_real]) & (w >= 0)
        counts = jnp.where(
            live_v, jnp.clip(full_counts[vt_real] - w * K, 0, K), 0)
        tstart = jnp.where(live_v, tstart[vt_real] + w * K, P)
        # truncation: slots beyond S windows per tile + windows beyond Tv
        n_truncated = (jnp.sum(full_counts - covered)
                       + (jnp.sum(covered) - jnp.sum(counts)))
        vt_n = nwin

    gauss_idx = None
    if dense:
        # dense [T, K] splat-index matrix by SCATTER from the sorted stream
        # (a gather at tstart[:, None] + arange(K) costs 3.5x more on v5e:
        # the scatter writes only the live slots). Position of sorted slot p
        # within its tile is p - (start of its run of equal tile ids), a
        # pure vector computation — per-slot gathers of tstart cost ~10 ms.
        run_change = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), tile_s[1:] != tile_s[:-1]]
        )
        run_start = jax.lax.cummax(jnp.where(run_change, slot, 0))
        k_of_slot = slot - run_start
        sorted_ok = (tile_s < vt_total) & (k_of_slot < K)
        in_band = (tile_s >= tile_lo) & (tile_s < tile_hi)
        tile_clip = jnp.clip(tile_s, tile_lo, tile_hi - 1)
        dest = jnp.where(
            sorted_ok & in_band, (tile_clip - tile_lo) * K + k_of_slot, band * K
        )
        gauss_idx = (
            jnp.zeros((band * K,), jnp.int32)
            .at[dest]
            .set(g_sorted, mode="drop")
            .reshape(band, K)
        )

    # The sort and all integer plumbing feed both the forward blend and the
    # backward reduction; without a barrier XLA rematerializes the whole
    # chain in the backward pass (measured ~40 ms/step of pure waste).
    has_carry = stream and carry is not None
    has_win = vt_real is not None
    pin = [counts] + ([gauss_idx] if dense else []) \
        + ([g_sorted, tstart] if stream else []) \
        + ([sorted_carry] if has_carry else []) \
        + ([vt_real, vt_first, vt_n] if has_win else [])
    pin = list(jax.lax.optimization_barrier(tuple(pin)))
    if has_win:
        vt_real, vt_first, vt_n = pin[-3], pin[-2], pin[-1]
        pin = pin[:-3]
    counts = pin[0]
    if dense:
        gauss_idx = pin[1]
    if has_carry:
        g_sorted, tstart, sorted_carry = pin[-3], pin[-2], pin[-1]
    elif stream:
        g_sorted, tstart = pin[-2], pin[-1]

    return TileBins(
        gauss_idx=gauss_idx,
        counts=counts.astype(jnp.int32),
        total=total,
        n_dropped=n_dropped,
        n_truncated=n_truncated,
        max_intersections=P,
        tile_start=tstart if stream else None,
        sorted_gauss=g_sorted if stream else None,
        sorted_carry=sorted_carry if (stream and carry is not None) else None,
        vt_real=vt_real,
        vt_first=vt_first,
        vt_n=vt_n,
    )
