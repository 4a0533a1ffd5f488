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
    camera; footprint weights accumulate into a per-pixel [H, W, num_ids]
    tensor; the refined mask is the per-pixel argmax with weight < 0.5 -> -1
    (sam_refinement_utils.py:915-942, 1221-1302).

The reference renders ONE rasterization per (splat, visible camera) — its
own comments call this astronomically slow. Here both the per-splat vote
(splat x id) and the per-pixel accumulation (pixel x id) are computed for
ALL splats of a camera at once by reusing the tile rasterizer's binning:
per tile chunk, footprint alphas [Kc, 256] contract with one-hot mask ids
[256, M] on the MXU, so a camera costs O(one render) instead of O(N renders).
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
    visible: jnp.ndarray,  # [N] bool (this camera)
    max_ids: int,
    config: RasterizeConfig,
):
    """Stage-2 accumulation: -> weights [H, W, M] = sum over visible splats
    of footprint alpha onto their global id."""
    cov3d = build_cov3d(gs.scales, gs.quats)
    proj, bins, pix, (grid_x, grid_y) = _prepare(
        camera, gs.means, cov3d, config, None, force_dense=True
    )
    opac = jnp.where(proj.valid & gs.alive & visible & (splat_global_id > 0),
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
    return acc[:H, :W]


def refine_sam_masks(
    gs: GaussianState,
    cameras: list[Camera],
    sam_ids: np.ndarray,  # [V, H, W] per-view level-decoded ids (0 invalid)
    config: RasterizeConfig = RasterizeConfig(),
    anchor_stride: int = ANCHOR_STRIDE,
    bg=None,
) -> np.ndarray:
    """-> refined [V, H, W] cross-view-consistent ids (-1 void, like the
    reference's final masks)."""
    V = len(cameras)
    max_ids = int(sam_ids.max())
    if max_ids == 0:
        return np.where(sam_ids > 0, sam_ids, -1)
    bg = jnp.zeros(3) if bg is None else bg

    # per-camera depth maps + per-splat votes/visibility
    votes_all, vis_all = [], []
    for v in range(V):
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
    votes_all = np.stack(votes_all)  # [V, N, M]
    vis_all = np.stack(vis_all)  # [V, N]

    # stage 1: global id sync via anchor splats (host graph merge).
    # The per-anchor winners are precomputed in ONE vectorized argmax pass
    # ([V, A] scalars) so the merge loop only touches scalars — the naive
    # per-(anchor, view) [M]-vector reads are O(A*V*M) numpy-dispatch-bound.
    opac = np.asarray(gs.opacity)
    anchors = np.flatnonzero((opac >= ANCHOR_OPACITY) & np.asarray(gs.alive))
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

    # per-splat dominant GLOBAL id across its visible views; the local->global
    # column accumulation is one np.add.at per view (duplicate-safe), not an
    # M-iteration python loop
    n = gs.capacity
    gvotes = np.zeros((n, n_gids + 1), np.float32)
    for v in range(V):
        remap = local2global[v]  # [max_ids+1]
        cols = remap[1:]  # global id of local ids 1..M
        keep = cols > 0
        if not keep.any():
            continue
        w = votes_all[v] * vis_all[v][:, None]  # [N, M]
        np.add.at(gvotes.T, cols[keep], w[:, keep].T)
    splat_gid = np.where(gvotes[:, 1:].max(axis=1) > 0,
                         gvotes[:, 1:].argmax(axis=1) + 1, 0).astype(np.int32)

    # stage 2: per-camera expansion + argmax
    refined = np.full_like(sam_ids, -1, dtype=np.int64)
    gid_j = jnp.asarray(splat_gid)
    for v in range(V):
        weights = pixel_weight_accumulation(
            gs, cameras[v], gid_j, jnp.asarray(vis_all[v]), n_gids, config
        )
        wnp = np.asarray(weights)
        best = wnp.argmax(axis=-1)
        wmax = wnp.max(axis=-1)
        refined[v] = np.where(wmax >= EXPANSION_THRESHOLD, best + 1, -1)
    return refined
