"""Mesh-sharded twins of the SAM-refiner device passes (refine/sam_refiner).

The refiner is the reference's most expensive subsystem
(reference utils/sam_refinement_utils.py:915-942, 1221-1302; SURVEY.md §3.4).
Its host graph-merge (stage 1) is inherently sequential scalar work, but the
three device passes it orchestrates per view — the depth render, the
footprint-weighted id votes, and the stage-2 pixel/id weight accumulation —
are exactly the tile contractions this package already shards for training
and the pseudo sweeps. Under `Trainer(mesh=...)` the single-device refiner
would gather the full Gaussian state to one device (the one sweep that still
did, pre-r4); this module keeps the state sharded:

  phase 1 (sharded over Gaussians): covariance + EWA projection on each
    device's N/d splats, then ONE all_gather of the compact projected table;
  phase 2 (sharded over tiles): every device bins the gathered table
    identically (cheap integer sort) and contracts ONLY its own tile rows —
    depth blends, alpha x one-hot(sam id) votes, alpha x one-hot(global id)
    accumulation;
  combine: votes psum over the mesh (each device saw disjoint tiles);
    depth / weights all_gather over tiles.

Outputs are REPLICATED (out_specs P()): the orchestrator pulls them to host
numpy for the graph merge, and fully-replicated arrays convert on every
process of a multi-host mesh without a process_allgather.
"""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.ops import blend
from opengaussian_tpu.ops.binning import bin_gaussians
from opengaussian_tpu.ops.projection import TILE, build_cov3d, project
from opengaussian_tpu.ops.rasterize import RasterizeConfig, _tile_pixels
from opengaussian_tpu.parallel.render import _gather_proj
from opengaussian_tpu.refine.sam_refiner import DEPTH_THRESHOLD, _tile_sam_onehot


def _own_tiles(x, axis, Tp, pad_value=0):
    """Slice this device's tile rows out of a [T, ...]-leading array."""
    T = x.shape[0]
    nd = jax.lax.axis_size(axis)
    r = jax.lax.axis_index(axis)
    tl = Tp // nd
    pad = [(0, Tp - T)] + [(0, 0)] * (x.ndim - 1)
    return jax.lax.dynamic_slice_in_dim(
        jnp.pad(x, pad, constant_values=pad_value), r * tl, tl, axis=0
    ), r * tl


def _untile(x, grid_x, grid_y, H, W):
    """[T, 256, C] tile rows -> [H, W, C] image (static reshapes)."""
    ch = x.shape[-1]
    x = x[: grid_x * grid_y].reshape(grid_y, grid_x, TILE, TILE, ch)
    x = x.transpose(0, 2, 1, 3, 4).reshape(grid_y * TILE, grid_x * TILE, ch)
    return x[:H, :W]


def make_refiner_fns(mesh: Mesh, config: RasterizeConfig, axis: str = "dev"):
    """-> namespace(depth_votes, pixel_weights): jitted mesh-sharded twins of
    refine/sam_refiner.splat_id_votes (fused with its depth render) and
    pixel_weight_accumulation, drop-ins for refine_sam_masks(sharded_fns=...).

    Gaussian-state leaves arrive sharded P(axis) over capacity; per-view
    images/masks replicated; outputs replicated."""

    def _project_bin(cam, means, cov, opac, axis_, tight: bool):
        """Shared phase-1: local projection, ONE table gather, dense bins.
        tight mirrors which single-device path is being twinned: the depth
        render goes through rasterize() and (by default) tightens radii by
        opacity; splat_id_votes/_prepare projects with opacities=None."""
        H, W = cam.height, cam.width
        grid_x = (W + TILE - 1) // TILE
        grid_y = (H + TILE - 1) // TILE
        proj = project(
            means, cov, cam,
            opacities=opac if (tight and config.tight_radius) else None,
        )
        proj, _, opac_f = _gather_proj(proj, means[:, :1], opac, axis_)
        P_budget = config.max_intersections(opac_f.shape[0])
        bins = bin_gaussians(proj, grid_x, grid_y, P_budget,
                             config.max_per_tile, dense=True)
        return proj, opac_f, bins, grid_x, grid_y

    def _chunk_scan(body, init, counts_own, idx_own):
        """Scan max_per_tile/chunk chunks of this device's tile rows."""
        chunk = config.chunk
        nsteps = config.max_per_tile // chunk

        def step(acc, i):
            ids = jax.lax.dynamic_slice_in_dim(idx_own, i * chunk, chunk, 1)
            kmask = ((i * chunk + jnp.arange(chunk))[None, :]
                     < counts_own[:, None])
            return body(acc, ids, kmask), None

        acc, _ = jax.lax.scan(step, init, jnp.arange(nsteps))
        return acc

    @partial(jax.jit, static_argnames=("max_ids",))
    def depth_votes(gs, camera: Camera, sam_ids, max_ids: int):
        """-> (votes [N, max_ids], visible [N], depth [H, W]) — the sharded
        fusion of the refiner's per-view depth render + splat_id_votes
        (refine/sam_refiner.py:74-120); one projection serves both."""
        H, W = camera.height, camera.width
        n_total = gs.capacity

        def local(cam, means, cov, opac, alive, sam):
            nd = jax.lax.axis_size(axis)

            # -- depth pass: twin of the rasterize() depth render (raw
            # opacity, tight radii). blend.blend_chunk carries the exact
            # classic rules (0.99 clamp, 1/255 skip, T<1e-4 stop).
            proj_d, opac_d, bins_d, grid_x, grid_y = _project_bin(
                cam, means, cov, opac, axis, tight=True)
            T = grid_x * grid_y
            Tp = ((T + nd - 1) // nd) * nd
            tl = Tp // nd
            counts_d, t0 = _own_tiles(bins_d.counts, axis, Tp)
            idx_d, _ = _own_tiles(bins_d.gauss_idx, axis, Tp)
            pix_own, _ = _own_tiles(_tile_pixels(grid_x, grid_y), axis, Tp)
            opac_dm = jnp.where(proj_d.valid, opac_d, 0.0)

            def depth_body(acc, ids, kmask):
                d_acc, bc = acc
                a = blend.alpha_from_conic(
                    proj_d.mean2d[ids], proj_d.conic[ids],
                    jnp.where(kmask, opac_dm[ids], 0.0), pix_own,
                )
                w, bc = blend.blend_chunk(a, bc)  # [tl, Kc, 256]
                d_acc = d_acc + jnp.einsum(
                    "tkp,tk->tp", w, proj_d.depth[ids],
                    preferred_element_type=jnp.float32)
                return (d_acc, bc)

            d_acc, bc_fin = _chunk_scan(
                depth_body,
                (jnp.zeros((tl, TILE * TILE)),
                 blend.init_carry((tl, TILE * TILE))),
                counts_d, idx_d)
            d_tiles = jax.lax.all_gather(
                jnp.stack([d_acc, 1.0 - bc_fin.T], axis=-1), axis,
                axis=0, tiled=True)  # [Tp, 256, 2]
            dimg = _untile(d_tiles, grid_x, grid_y, H, W)
            depth = dimg[..., 0] / jnp.maximum(dimg[..., 1], 1e-6)

            # -- vote pass: twin of splat_id_votes (alive-masked opacity,
            # untightened radii, raw footprint alpha — no blend rules)
            proj_v, opac_v, bins_v, _, _ = _project_bin(
                cam, means, cov, jnp.where(alive, opac, 0.0), axis,
                tight=False)
            counts_v, _ = _own_tiles(bins_v.counts, axis, Tp)
            idx_v, _ = _own_tiles(bins_v.gauss_idx, axis, Tp)
            opac_vm = jnp.where(proj_v.valid, opac_v, 0.0)

            # stage-0 visibility on the FULL gathered table (replicated)
            cx = jnp.clip(proj_v.mean2d[:, 0].astype(jnp.int32), 0, W - 1)
            cy = jnp.clip(proj_v.mean2d[:, 1].astype(jnp.int32), 0, H - 1)
            visible = proj_v.valid & (
                jnp.abs(proj_v.depth - depth[cy, cx]) < DEPTH_THRESHOLD)

            # votes: footprint alpha x one-hot(sam id) on own tiles, psum
            onehot_full = _tile_sam_onehot(sam, grid_x, grid_y, max_ids)
            onehot_own, _ = _own_tiles(onehot_full, axis, Tp)

            def vote_body(votes, ids, kmask):
                a = blend.alpha_from_conic(
                    proj_v.mean2d[ids], proj_v.conic[ids],
                    jnp.where(kmask, opac_vm[ids], 0.0), pix_own)
                v = jnp.einsum("tkp,tpm->tkm", a, onehot_own,
                               preferred_element_type=jnp.float32)
                return votes.at[ids.reshape(-1)].add(
                    v.reshape(-1, max_ids))

            votes = _chunk_scan(
                vote_body, jnp.zeros((n_total, max_ids)), counts_v, idx_v)
            votes = jax.lax.psum(votes, axis)
            return votes, visible, depth

        pspec = P(axis)
        cam_spec = jax.tree.map(lambda _: P(), camera)
        cov3d = build_cov3d(gs.scales, gs.quats)
        return shard_map(
            local, mesh=mesh,
            in_specs=(cam_spec, pspec, pspec, pspec, pspec, P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(camera, gs.means, cov3d, gs.opacity, gs.alive, sam_ids)

    @partial(jax.jit, static_argnames=("max_ids",))
    def pixel_weights(gs, camera: Camera, splat_gid, contrib, synced_mask,
                      n_match, max_ids: int):
        """-> weights [H, W, max_ids] — sharded twin of
        pixel_weight_accumulation (refine/sam_refiner.py:124-178): base-mask
        pixels take 1 + n_match, footprint alpha lands on extension pixels.
        splat_gid/contrib arrive sharded P(axis) like the state."""
        H, W = camera.height, camera.width

        def local(cam, means, cov, opac, alive, gid, con, synced, nm):
            opac_in = jnp.where(alive & con & (gid > 0), opac, 0.0)
            proj, opac_f, bins, grid_x, grid_y = _project_bin(
                cam, means, cov, opac_in, axis, tight=False)
            gid_f = jax.lax.all_gather(gid, axis, axis=0, tiled=True)
            T = grid_x * grid_y
            nd = jax.lax.axis_size(axis)
            Tp = ((T + nd - 1) // nd) * nd
            counts_own, t0 = _own_tiles(bins.counts, axis, Tp)
            idx_own, _ = _own_tiles(bins.gauss_idx, axis, Tp)
            pix_own, _ = _own_tiles(_tile_pixels(grid_x, grid_y), axis, Tp)
            opac_m = jnp.where(proj.valid, opac_f, 0.0)
            tl = Tp // nd

            def acc_body(acc, ids, kmask):
                a = blend.alpha_from_conic(
                    proj.mean2d[ids], proj.conic[ids],
                    jnp.where(kmask, opac_m[ids], 0.0), pix_own)
                oh = (gid_f[ids][:, :, None]
                      == jnp.arange(1, max_ids + 1)[None, None, :])
                return acc + jnp.einsum(
                    "tkp,tkm->tpm", a, oh.astype(jnp.float32),
                    preferred_element_type=jnp.float32)

            acc = _chunk_scan(
                acc_body, jnp.zeros((tl, TILE * TILE, max_ids)),
                counts_own, idx_own)
            acc = jax.lax.all_gather(acc, axis, axis=0, tiled=True)
            acc = _untile(acc, grid_x, grid_y, H, W)  # [H, W, M]
            base = (synced[:, :, None]
                    == jnp.arange(1, max_ids + 1)[None, None, :]
                    ).astype(jnp.float32)
            return base * (1.0 + nm[None, None, :]) + (1.0 - base) * acc

        pspec = P(axis)
        cam_spec = jax.tree.map(lambda _: P(), camera)
        cov3d = build_cov3d(gs.scales, gs.quats)
        return shard_map(
            local, mesh=mesh,
            in_specs=(cam_spec, pspec, pspec, pspec, pspec, pspec, pspec,
                      P(), P()),
            out_specs=P(),
            check_vma=False,
        )(camera, gs.means, cov3d, gs.opacity, gs.alive, splat_gid, contrib,
          synced_mask, n_match)

    return SimpleNamespace(depth_votes=depth_votes, pixel_weights=pixel_weights)
