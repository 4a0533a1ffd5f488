"""Multi-view SAM mask refinement (the fork's subsystem), batched for TPU.

Behavioral rewrite of the reference's MultiViewSAMMaskRefiner
(reference utils/sam_refinement_utils.py:320-1318, SURVEY.md §3.4):

  stage 0: per-camera depth maps; a splat is visible in a camera when its
    projected center is in-frustum, in front, and within 15 cm of the
    rendered depth (sam_refinement_utils.py:526-651);
  stage 1 (ID sync): anchor splats (opacity >= 0.99, strided) vote the
    dominant SAM id inside their footprint in every visible camera; each
    anchor mints a global id unifying its per-view winners
    (sam_refinement_utils.py:902-913, 1055-1115);
  stage 2 (mask expansion): every splat votes its dominant global id per
    camera; the winner is the camera-majority id; in cameras where the
    per-view dominant equals the winner, base-mask pixels take the 1.0 init
    plus +1 per contributing splat while footprint weights accumulate on
    EXTENSION pixels only; the refined mask is the per-pixel argmax with
    weight < 0.5 -> -1 (sam_refinement_utils.py:915-942, 1221-1302).

The reference renders ONE rasterization per (splat, visible camera) — its
own comments call this astronomically slow. Here both the per-splat vote
(splat x id) and the per-pixel accumulation (pixel x id) are computed for
ALL splats of a camera at once by reusing the tile rasterizer's binning:
per tile chunk, footprint alphas [Kc, 256] contract with one-hot mask ids
[256, M] on the MXU, so a camera costs O(one render) instead of O(N renders).

Documented deviations from the reference (tests/test_refiner_golden.py pins
everything else):
  * the void id (-1 / here 0) never votes and is never expanded — the
    reference lets void win a splat's weighted bincount and then grows the
    void segment (:679-703), which merges unrelated background regions;
  * stage-1 id sync merges TRANSITIVELY: an anchor adopting an
    already-claimed (view, id) pair links its remaining pairs into that
    global id, where the reference's first-claim sync (:1096-1112) leaves
    them under a fresh id (no merge across anchors);
  * vote ties across cameras break toward the earliest camera (reference
    dict-insertion max), and within a view's weighted bincount toward the
    smallest id (np.argmax) vs torch.argmax (same rule).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.models.gaussians import GaussianState
from opengaussian_tpu.ops import blend
from opengaussian_tpu.ops.projection import TILE, build_cov3d, project
from opengaussian_tpu.ops.rasterize import RasterizeConfig, _prepare, _tile_pixels, rasterize

DEPTH_THRESHOLD = 0.15  # meters (sam_refinement_utils.py:628)
ANCHOR_OPACITY = 0.99  # stage-1 anchor gate (:1159-1204)
ANCHOR_STRIDE = 1000
EXPANSION_THRESHOLD = 0.5  # final per-pixel weight gate (:1287-1302)


def _host(x) -> np.ndarray:
    """np.asarray that also works on multi-host-sharded leaves (the graph
    merge below needs the GLOBAL opacity/alive vectors on every process)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def _tile_sam_onehot(sam_ids, grid_x, grid_y, max_ids):
    """[H, W] ids -> [T, 256, M] one-hot (id 0 = invalid excluded)."""
    H, W = sam_ids.shape
    pad_h, pad_w = grid_y * TILE - H, grid_x * TILE - W
    s = jnp.pad(sam_ids, ((0, pad_h), (0, pad_w)))
    s = s.reshape(grid_y, TILE, grid_x, TILE).transpose(0, 2, 1, 3)
    s = s.reshape(grid_y * grid_x, TILE * TILE)
    ids = jnp.arange(1, max_ids + 1, dtype=s.dtype)
    return (s[:, :, None] == ids[None, None, :]).astype(jnp.float32)


@partial(jax.jit, static_argnames=("max_ids", "config"))
def splat_id_votes(
    gs: GaussianState,
    camera: Camera,
    sam_ids: jnp.ndarray,  # [H, W] (0 invalid)
    depth_map: jnp.ndarray,  # [H, W] expected depth of the full render
    max_ids: int,
    config: RasterizeConfig,
):
    """-> (votes [N, M] footprint-weighted id histogram per splat,
           visible [N] bool depth-tested visibility)."""
    n = gs.capacity
    cov3d = build_cov3d(gs.scales, gs.quats)
    proj, bins, pix, (grid_x, grid_y) = _prepare(
        camera, gs.means, cov3d, config, None, force_dense=True
    )

    # stage-0 visibility: in frustum + depth agreement at the projected center
    H, W = camera.height, camera.width
    cx = jnp.clip(proj.mean2d[:, 0].astype(jnp.int32), 0, W - 1)
    cy = jnp.clip(proj.mean2d[:, 1].astype(jnp.int32), 0, H - 1)
    d_at = depth_map[cy, cx]
    visible = proj.valid & (jnp.abs(proj.depth - d_at) < DEPTH_THRESHOLD)

    onehot = _tile_sam_onehot(sam_ids, grid_x, grid_y, max_ids)  # [T,256,M]
    opac = jnp.where(proj.valid & gs.alive, gs.opacity, 0.0)

    K = config.max_per_tile
    chunk = config.chunk
    nsteps = K // chunk

    def step(votes, i):
        ids = jax.lax.dynamic_slice_in_dim(bins.gauss_idx, i * chunk, chunk, 1)
        kmask = (i * chunk + jnp.arange(chunk))[None, :] < bins.counts[:, None]
        o = jnp.where(kmask, opac[ids], 0.0)
        alpha = blend.alpha_from_conic(
            proj.mean2d[ids], proj.conic[ids], o, pix
        )  # [T,Kc,256]
        v_chunk = jnp.einsum(
            "tkp,tpm->tkm", alpha, onehot, preferred_element_type=jnp.float32
        )
        votes = votes.at[ids.reshape(-1)].add(v_chunk.reshape(-1, max_ids))
        return votes, None

    votes, _ = jax.lax.scan(
        step, jnp.zeros((n, max_ids), jnp.float32), jnp.arange(nsteps)
    )
    return votes, visible


@partial(jax.jit, static_argnames=("max_ids", "config"))
def pixel_weight_accumulation(
    gs: GaussianState,
    camera: Camera,
    splat_global_id: jnp.ndarray,  # [N] int32 (0 = unassigned, 1..M)
    contrib: jnp.ndarray,  # [N] bool: visible AND per-cam dominant == winner
    synced_mask: jnp.ndarray,  # [H, W] int32 per-pixel global id (0 = void)
    n_match: jnp.ndarray,  # [M] float: contributing-splat count per id
    max_ids: int,
    config: RasterizeConfig,
):
    """Stage-2 accumulation with the reference's semantics
    (sam_refinement_utils.py:928-940 init, :1022-1035 base/extension split):

      weights[p, g] = base[p, g] * (1 + n_match[g])
                      + (1 - base[p, g]) * sum_{contributing splats of g} alpha

    base[p, g] = (synced_mask[p] == g): base-mask pixels get the 1.0 init
    plus +1 per contributing splat; footprint alpha lands only on EXTENSION
    pixels (outside the winner's base mask)."""
    cov3d = build_cov3d(gs.scales, gs.quats)
    proj, bins, pix, (grid_x, grid_y) = _prepare(
        camera, gs.means, cov3d, config, None, force_dense=True
    )
    opac = jnp.where(proj.valid & gs.alive & contrib & (splat_global_id > 0),
                     gs.opacity, 0.0)
    gid_onehot_table = splat_global_id  # gathered per chunk below

    K = config.max_per_tile
    chunk = config.chunk
    nsteps = K // chunk
    T = bins.gauss_idx.shape[0]

    def step(acc, i):
        ids = jax.lax.dynamic_slice_in_dim(bins.gauss_idx, i * chunk, chunk, 1)
        kmask = (i * chunk + jnp.arange(chunk))[None, :] < bins.counts[:, None]
        o = jnp.where(kmask, opac[ids], 0.0)
        alpha = blend.alpha_from_conic(proj.mean2d[ids], proj.conic[ids], o, pix)
        gid = gid_onehot_table[ids]  # [T,Kc]
        onehot = (gid[:, :, None] == jnp.arange(1, max_ids + 1)[None, None, :])
        acc = acc + jnp.einsum(
            "tkp,tkm->tpm", alpha, onehot.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return acc, None

    acc, _ = jax.lax.scan(
        step, jnp.zeros((T, TILE * TILE, max_ids), jnp.float32), jnp.arange(nsteps)
    )
    H, W = camera.height, camera.width
    acc = acc.reshape(grid_y, grid_x, TILE, TILE, max_ids)
    acc = acc.transpose(0, 2, 1, 3, 4).reshape(grid_y * TILE, grid_x * TILE, max_ids)
    acc = acc[:H, :W]  # [H, W, M] total footprint alpha per id
    base = (synced_mask[:, :, None] ==
            jnp.arange(1, max_ids + 1)[None, None, :]).astype(jnp.float32)
    return base * (1.0 + n_match[None, None, :]) + (1.0 - base) * acc


@partial(jax.jit, static_argnames=("max_ids", "config", "threshold"))
def pixel_weight_expand(
    gs, camera, splat_global_id, contrib, synced_mask, n_match,
    max_ids: int, config: RasterizeConfig, threshold: float,
):
    """pixel_weight_accumulation + the per-pixel argmax/threshold ON DEVICE.

    The [H, W, n_gids] weight volume never leaves the chip: at the
    north-star shape (648x484, n_gids in the hundreds) that volume is
    hundreds of MB per view, and the axon tunnel moves D2H at ~44 MB/s
    (measured 2026-08-20) — transferring it per view put the full
    refinement beyond a 58-min timeout (tools/refine_bench.py history).
    Transferring the [H, W] winners + [H, W] max weights is ~2.5 MB.
    -> refined row [H, W] int32 (-1 void), exactly the caller's
    where(wmax >= threshold, argmax + 1, -1)."""
    w = pixel_weight_accumulation(
        gs, camera, splat_global_id, contrib, synced_mask, n_match,
        max_ids, config,
    )
    best = jnp.argmax(w, axis=-1).astype(jnp.int32)
    wmax = jnp.max(w, axis=-1)
    return jnp.where(wmax >= threshold, best + 1, -1)


def majority_winner(dom: np.ndarray) -> np.ndarray:
    """Per-splat MAJORITY over per-view dominant ids, 0 = no vote (reference
    expand_masks:1005-1020 counts one vote per camera; max() over the
    insertion-ordered dict returns the EARLIEST camera's id on ties).

    O(V log V * N): run lengths over column-sorted dominants pick the mode;
    the rare multi-way ties fall back to the exact insertion-order scan on
    just the tied columns (an O(V^2 * N) pass over all columns measured
    minutes of host time at ScanNet scale). dom: [V, N] int."""
    V, n = dom.shape
    ds = np.sort(dom, axis=0)  # [V, N] ascending, zeros first
    run = np.ones((V, n), np.int64)
    for v in range(1, V):
        same = (ds[v] == ds[v - 1]) & (ds[v] > 0)
        run[v] = np.where(same, run[v - 1] + 1, 1)
    run = np.where(ds > 0, run, 0)
    best_row = run.argmax(axis=0)
    best_cnt = np.take_along_axis(run, best_row[None], axis=0)[0]
    winner = np.where(
        best_cnt > 0, np.take_along_axis(ds, best_row[None], axis=0)[0], 0
    ).astype(np.int32)
    n_max_runs = (run == np.maximum(best_cnt, 1)[None, :]).sum(axis=0)
    tied = (best_cnt > 0) & (n_max_runs > 1)
    if tied.any():
        cols = np.flatnonzero(tied)
        bc = np.zeros(len(cols), np.int64)
        sg = np.zeros(len(cols), np.int32)
        sub = dom[:, cols]
        for v in range(V):
            c = sub[v]
            cnt_v = ((sub == c[None, :]) & (c[None, :] > 0)).sum(axis=0)
            better = cnt_v > bc
            bc = np.where(better, cnt_v, bc)
            sg = np.where(better, c, sg)
        winner[cols] = sg
    return winner


def refine_sam_masks(
    gs: GaussianState,
    cameras: list[Camera],
    sam_ids: np.ndarray,  # [V, H, W] per-view level-decoded ids (0 invalid)
    config: RasterizeConfig = RasterizeConfig(),
    anchor_stride: int = ANCHOR_STRIDE,
    bg=None,
    trace=None,  # refine/introspect.RefinerTrace, or None
    sharded_fns=None,  # parallel/refine.make_refiner_fns(...) namespace
    timings: dict | None = None,  # phase wall-s accumulator (device passes
    # vs host graph-merge split; tools/refine_bench.py)
) -> np.ndarray:
    """-> refined [V, H, W] cross-view-consistent ids (-1 void, like the
    reference's final masks).

    sharded_fns: under `Trainer(mesh=...)` the per-view device passes route
    through the mesh-sharded twins (parallel/refine.py) so `gs` can stay
    sharded over the mesh — the host graph-merge below is identical."""
    import time as _time

    def _mark(phase, t0):
        if timings is not None:
            timings[phase] = timings.get(phase, 0.0) + (_time.perf_counter() - t0)
        return _time.perf_counter()

    _t = _time.perf_counter()
    V = len(cameras)
    max_ids = int(sam_ids.max())
    if max_ids == 0:
        return np.where(sam_ids > 0, sam_ids, -1)
    bg = jnp.zeros(3) if bg is None else bg
    if trace is not None:
        trace.log_scene(_host(gs.means), _host(gs.alive))

    # per-camera depth maps + per-splat votes/visibility
    votes_all, vis_all = [], []
    for v in range(V):
        if sharded_fns is not None:
            votes, vis, depth = sharded_fns.depth_votes(
                gs, cameras[v], jnp.asarray(sam_ids[v]), max_ids
            )
        else:
            out = rasterize(
                cameras[v], gs.means, build_cov3d(gs.scales, gs.quats),
                gs.opacity, jnp.zeros((gs.capacity, 1)), jnp.zeros(1), config,
            )
            depth = out.depth / jnp.maximum(out.alpha, 1e-6)
            votes, vis = splat_id_votes(
                gs, cameras[v], jnp.asarray(sam_ids[v]), depth, max_ids, config
            )
        votes_all.append(np.asarray(votes))
        vis_all.append(np.asarray(vis))
        if trace is not None:
            trace.log_depth(v, np.asarray(depth), vis_all[-1])
    votes_all = np.stack(votes_all)  # [V, N, M]
    vis_all = np.stack(vis_all)  # [V, N]
    _t = _mark("device_votes_s", _t)

    # stage 1: global id sync via anchor splats (host graph merge).
    # The per-anchor winners are precomputed in ONE vectorized argmax pass
    # ([V, A] scalars) so the merge loop only touches scalars — the naive
    # per-(anchor, view) [M]-vector reads are O(A*V*M) numpy-dispatch-bound.
    opac = _host(gs.opacity)
    anchors = np.flatnonzero((opac >= ANCHOR_OPACITY) & _host(gs.alive))
    anchors = anchors[::anchor_stride] if len(anchors) else anchors
    win_lid = np.zeros((V, len(anchors)), np.int32)  # 0 = no winner
    if len(anchors):
        va = votes_all[:, anchors]  # [V, A, M]
        has = (va.max(axis=2) > 0) & vis_all[:, anchors]
        win_lid = np.where(has, va.argmax(axis=2) + 1, 0).astype(np.int32)
    # per (view, local id) -> global id mapping
    local2global = np.zeros((V, max_ids + 1), np.int32)
    next_gid = 1
    for ai in range(len(anchors)):
        gid = 0
        for v in range(V):
            lid = win_lid[v, ai]
            if lid == 0:
                continue
            if local2global[v, lid] > 0:
                gid = gid or int(local2global[v, lid])
            else:
                if gid == 0:
                    gid = next_gid
                    next_gid += 1
                local2global[v, lid] = gid
    # unseen local ids keep their own fresh global ids (per-view np.unique:
    # O(V*H*W), not the O(V*M*H*W) of testing every id against every image)
    for v in range(V):
        present = np.unique(sam_ids[v])
        present = present[(present >= 1) & (present <= max_ids)]
        fresh = present[local2global[v, present] == 0]
        local2global[v, fresh] = next_gid + np.arange(len(fresh), dtype=np.int32)
        next_gid += len(fresh)
    n_gids = next_gid - 1
    if trace is not None:
        trace.log_stage1(anchors, win_lid, local2global, n_gids)
    _t = _mark("host_stage1_merge_s", _t)

    # per-view dominant GLOBAL id per splat (footprint-weighted vote within
    # each view, reference get_most_common_id_in_mask_weighted:653-703, with
    # the local->global remap summing columns that the sync merged). The
    # reduction stays in LOCAL column space ([N, M] with M = ids per view)
    # instead of scattering into [N, n_gids]: n_gids grows ~V*M across the
    # scene, and the old per-view [N, n_gids] accumulator was ~0.7 GB/view
    # at the 100k-splat/60-view north-star shape (tools/refine_bench.py) —
    # the merge-summed columns (the only reason for global space) are
    # grouped by np.add.reduceat over gid-sorted columns.
    n = gs.capacity
    dom = np.zeros((V, n), np.int32)  # 0 = no vote in this view
    for v in range(V):
        remap = local2global[v]  # [max_ids+1]
        cols = remap[1:]  # global id of local ids 1..M
        keep_idx = np.flatnonzero(cols > 0)
        if len(keep_idx) == 0:
            continue
        order = keep_idx[np.argsort(cols[keep_idx], kind="stable")]
        gids_sorted = cols[order]
        starts = np.flatnonzero(
            np.concatenate([[True], gids_sorted[1:] != gids_sorted[:-1]])
        )
        group_gid = gids_sorted[starts]  # [G_v] distinct global ids
        vred = np.add.reduceat(votes_all[v][:, order], starts, axis=1)
        has = (vred.max(axis=1) > 0) & vis_all[v]
        # ties: argmax picks the first gid-sorted group — same smallest-id
        # rule as the old global-space argmax
        dom[v] = np.where(has, group_gid[vred.argmax(axis=1)], 0)

    _t = _mark("host_dominant_s", _t)
    splat_gid = majority_winner(dom)
    _t = _mark("host_majority_s", _t)

    # stage 2: per-camera expansion + argmax. A splat contributes to camera v
    # only where its per-view dominant id equals its global winner
    # (reference expand_masks:1021-1035).
    refined = np.full_like(sam_ids, -1, dtype=np.int64)
    gid_j = jnp.asarray(splat_gid)
    for v in range(V):
        match_v = (dom[v] == splat_gid) & (splat_gid > 0)
        n_match = np.bincount(splat_gid[match_v],
                              minlength=n_gids + 1)[1:].astype(np.float32)
        synced_v = local2global[v][sam_ids[v]].astype(np.int32)
        _t = _mark("host_expand_prep_s", _t)
        if sharded_fns is not None:
            weights = sharded_fns.pixel_weights(
                gs, cameras[v], gid_j, jnp.asarray(match_v),
                jnp.asarray(synced_v), jnp.asarray(n_match), n_gids,
            )
        elif trace is None:
            # fused device argmax: the [H, W, n_gids] volume stays on chip
            # (see pixel_weight_expand — the per-view transfer dominated
            # the whole refinement over the slow tunnel)
            refined[v] = np.asarray(pixel_weight_expand(
                gs, cameras[v], gid_j, jnp.asarray(match_v),
                jnp.asarray(synced_v), jnp.asarray(n_match), n_gids, config,
                float(EXPANSION_THRESHOLD),
            ))
            _t = _mark("device_expand_s", _t)
            continue
        else:
            weights = pixel_weight_accumulation(
                gs, cameras[v], gid_j, jnp.asarray(match_v),
                jnp.asarray(synced_v), jnp.asarray(n_match), n_gids, config,
            )
        wnp = np.asarray(weights)
        _t = _mark("device_expand_s", _t)
        best = wnp.argmax(axis=-1)
        wmax = wnp.max(axis=-1)
        refined[v] = np.where(wmax >= EXPANSION_THRESHOLD, best + 1, -1)
        if trace is not None:
            trace.log_stage2(v, dom[v], splat_gid, wnp)
        _t = _mark("host_expand_argmax_s", _t)
    if trace is not None:
        trace.write(refined)
    return refined
