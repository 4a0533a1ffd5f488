"""Mesh-sharded preprocessing sweeps (pseudo labels, stage-3 association).

The stage-boundary sweeps are the most expensive non-training computation
(SURVEY.md §3.3: O(V) full renders in sweep 1, O(V*k1) cluster renders in
sweep 2, O(k1*V*k2) in the stage-3 language sweep). Under `Trainer(mesh=...)`
the training *steps* run sharded, but routing these sweeps through the
single-device `render`/`render_clusters` would gather the full Gaussian
state to one device per call — on the north-star config (millions of splats,
N hosts) that serializes or OOMs. This module provides sharded twins:

  * `render_groups_sharded` — the group-render core: projection runs
    Gaussian-sharded, the projected table is all_gathered once, every device
    bins it identically (cheap integer sort), and the per-group blends run
    over the device's OWN tile rows only (G x T/d tile blends per device);
  * `make_sweep_fns` — jitted sweep-1 / sweep-2 / stage-3 per-view functions
    with the same semantics as train/pseudo.py and train/lang.py (the
    post-render math is shared, imported from those modules), pluggable into
    `construct_pseudo_labels(sweep_fns=...)` and
    `associate_language(view_fn=...)`.

Forward-only: sweeps never backprop, so the group blends use the dense
[T, K] layout (vmap-friendly) without the custom-VJP stream kernels.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.ops.binning import bin_gaussians
from opengaussian_tpu.ops.projection import TILE, build_cov3d, project
from opengaussian_tpu.ops.rasterize import (
    RasterizeConfig,
    _blend_tiles,
    _tile_pixels,
)
from opengaussian_tpu.parallel.render import _gather_proj
from opengaussian_tpu.render import (
    COARSE_SCALE_LIMIT,
    MIN_CLUSTER_POINTS,
    OCCUR_SIL_THRESHOLD,
    encoded_ins_feat,
)
from opengaussian_tpu.train import lang as lang_mod
from opengaussian_tpu.train import pseudo as pseudo_mod
from opengaussian_tpu.utils import masks as masku


def render_groups_sharded(
    mesh: Mesh,
    camera: Camera,
    means3d,  # [N,3] sharded P(axis)
    cov3d,
    opac_g,  # [G,N] per-group masked opacities, sharded P(None, axis)
    payload,  # [N,C] sharded P(axis)
    bg,  # [C]
    config: RasterizeConfig,
    axis: str = "dev",
):
    """Sharded twin of ops/rasterize.rasterize_groups: -> (imgs [G,H,W,C],
    alphas [G,H,W], n_lost [])."""
    H, W = camera.height, camera.width
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    T = grid_x * grid_y
    nd = mesh.shape[axis]
    Tp = ((T + nd - 1) // nd) * nd
    C = payload.shape[1]
    n_total = means3d.shape[0]
    P_budget = config.max_intersections(n_total)

    def local(cam: Camera, means, cov, opacg, pay, bg_):
        r = jax.lax.axis_index(axis)
        opac_any = jnp.max(opacg, axis=0)
        proj = project(
            means, cov, cam,
            opacities=opac_any if config.tight_radius else None,
        )
        proj, pay_f, _ = _gather_proj(proj, pay, opac_any, axis)
        opacg_f = jax.lax.all_gather(opacg, axis, axis=1, tiled=True)  # [G,N]
        bins = bin_gaussians(proj, grid_x, grid_y, P_budget,
                             config.max_per_tile, dense=True)
        tl = Tp // nd
        t0 = r * tl
        counts = jax.lax.dynamic_slice_in_dim(
            jnp.pad(bins.counts, (0, Tp - T)), t0, tl, axis=0
        )
        idx = jax.lax.dynamic_slice_in_dim(
            jnp.pad(bins.gauss_idx, ((0, Tp - T), (0, 0))), t0, tl, axis=0
        )
        pix = jax.lax.dynamic_slice_in_dim(
            jnp.pad(_tile_pixels(grid_x, grid_y), ((0, Tp - T), (0, 0), (0, 0))),
            t0, tl, axis=0,
        )
        full_pay = jnp.concatenate([pay_f, proj.depth[:, None]], axis=-1)

        if config.use_pallas():
            from opengaussian_tpu.ops.rasterize_pallas import blend_tiles_pallas

            max_chunks = P_budget // config.chunk + tl

            def one(op_full):
                opac_m = jnp.where(proj.valid, op_full, 0.0)
                return blend_tiles_pallas(
                    proj.mean2d, proj.conic, opac_m, full_pay, idx, counts,
                    t0[None].astype(jnp.int32), config.chunk, grid_x,
                    max_chunks,
                )
        else:

            def one(op_full):
                opac_m = jnp.where(proj.valid, op_full, 0.0)
                return _blend_tiles(
                    proj.mean2d, proj.conic, opac_m, full_pay, idx, counts,
                    pix, config.chunk,
                )

        accum, t_final = jax.vmap(one)(opacg_f)  # [G,tl,256,C+1], [G,tl,256]
        img = accum[..., :C] + t_final[..., None] * bg_[None, None, None, :]
        n_lost = bins.n_dropped + bins.n_truncated  # identical on all devices
        return img, 1.0 - t_final, n_lost

    pspec = P(axis)
    gspec = P(None, axis)
    cam_spec = jax.tree.map(lambda _: P(), camera)
    img_t, alpha_t, n_lost = shard_map(
        local,
        mesh=mesh,
        in_specs=(cam_spec, pspec, pspec, gspec, pspec, P()),
        out_specs=(gspec, gspec, P()),
        check_vma=False,
    )(camera, means3d, cov3d, opac_g, payload, bg)

    def untile(x):
        G = x.shape[0]
        ch = x.shape[-1]
        x = x[:, :T].reshape(G, grid_y, grid_x, TILE, TILE, ch)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            G, grid_y * TILE, grid_x * TILE, ch
        )
        return x[:, :H, :W]

    return (
        untile(img_t),
        untile(alpha_t[..., None])[..., 0],
        n_lost,
    )


def _cluster_opacities(gs, cluster_ids, group_ids, better_vis: bool,
                       scale_limit: float):
    """[G,N] masked opacities + per-group member counts, built with
    elementwise sharded ops (no gather). Mirrors render/render_clusters."""
    member = cluster_ids[None, :] == group_ids[:, None]  # [G,N]
    keep = member & gs.alive[None, :]
    if better_vis:
        keep = keep & jnp.all(gs.scales < scale_limit, axis=-1)[None, :]
    counts = keep.sum(axis=-1)
    opac_g = jnp.where(keep, gs.opacity[None, :], 0.0)
    return opac_g, counts


def make_sweep_fns(mesh: Mesh, config: RasterizeConfig, k1: int, k2: int,
                   max_masks: int, axis: str = "dev"):
    """-> namespace(sweep1, sweep2, lang_view) of jitted mesh-sharded sweep
    functions, drop-in overrides for construct_pseudo_labels / associate_language."""
    from opengaussian_tpu.parallel.render import render_sharded

    @jax.jit
    def sweep1(gs, camera, sam_ids, bg):
        feat = encoded_ins_feat(gs, None, origin_feat=True)
        cov = build_cov3d(gs.scales, gs.quats)
        fbg = jnp.concatenate([bg, bg])
        img, _alpha, _depth, _radii, _lost = render_sharded(
            mesh, camera, gs.means, cov, gs.opacity, feat, fbg, config, axis
        )
        return pseudo_mod.sweep1_math(img, sam_ids, max_masks)

    @jax.jit
    def sweep2(gs, camera, pseudo_feat, pseudo_ids, cls_ids, bg):
        feat = encoded_ins_feat(gs, None, origin_feat=True)
        cov = build_cov3d(gs.scales, gs.quats)
        fbg = jnp.concatenate([bg, bg])
        opac_g, counts = _cluster_opacities(
            gs, cls_ids, jnp.arange(k1), better_vis=True,
            scale_limit=COARSE_SCALE_LIMIT,
        )
        imgs, alphas, _lost = render_groups_sharded(
            mesh, camera, gs.means, cov, opac_g, feat, fbg, config, axis
        )
        valid = counts >= MIN_CLUSTER_POINTS
        occur = (jnp.max(alphas, axis=(1, 2)) > OCCUR_SIL_THRESHOLD) & valid
        return pseudo_mod.sweep2_math(
            imgs, alphas, occur, pseudo_feat, pseudo_ids, max_masks
        )

    @jax.jit
    def lang_view(gs, leaf_ids, camera, pseudo_feat, pseudo_ids, occur_row, bg):
        """All k1 roots of one view, projection HOISTED out of the root scan
        (VERDICT r3 item 5): ONE sharded projection + table gather + binning
        per view, plus one gather each of the small per-splat vectors
        (opacity, alive, leaf id). The k1-root scan then runs with NO
        N-sized collectives — each iteration blends the device's own tile
        rows against per-root opacity masks built from the replicated
        vectors, and only the [k2, T/d]-tile blend results are gathered for
        scoring. The previous shape all-gathered the full projected table +
        payload + a [k2, N] opacity matrix once PER ROOT (k1x the traffic).
        tests/test_sweeps_sharded.py asserts the scan body is free of
        per-splat collectives and parity with the single-device sweep."""
        feat = encoded_ins_feat(gs, None, origin_feat=True)
        cov = build_cov3d(gs.scales, gs.quats)
        fbg = jnp.concatenate([bg, bg])
        pm, pm_valid = masku.masks_onehot(pseudo_ids, max_masks)
        p_mean = masku.mask_feature_mean(pseudo_feat, pm)

        H, W = camera.height, camera.width
        grid_x = (W + TILE - 1) // TILE
        grid_y = (H + TILE - 1) // TILE
        T = grid_x * grid_y
        nd = mesh.shape[axis]
        Tp = ((T + nd - 1) // nd) * nd
        tl = Tp // nd
        C = feat.shape[1]
        n_total = gs.capacity
        P_budget = config.max_intersections(n_total)

        def local(cam, means, cov_, opac, alive, leaf, pay, pm_, pmv_,
                  pmean_, occ_, bg_):
            r = jax.lax.axis_index(axis)
            # matches render_clusters semantics: keep = member & alive, so a
            # splat's tight radius uses its real opacity wherever alive
            opac_alive = jnp.where(alive, opac, 0.0)
            proj = project(
                means, cov_, cam,
                opacities=opac_alive if config.tight_radius else None,
            )
            proj, pay_f, opac_f = _gather_proj(proj, pay, opac_alive, axis)
            ag = lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True)
            alive_f = ag(alive)
            leaf_f = ag(leaf)
            bins = bin_gaussians(proj, grid_x, grid_y, P_budget,
                                 config.max_per_tile, dense=True)
            t0 = r * tl
            counts_t = jax.lax.dynamic_slice_in_dim(
                jnp.pad(bins.counts, (0, Tp - T)), t0, tl, axis=0
            )
            idx = jax.lax.dynamic_slice_in_dim(
                jnp.pad(bins.gauss_idx, ((0, Tp - T), (0, 0))), t0, tl, axis=0
            )
            pix = jax.lax.dynamic_slice_in_dim(
                jnp.pad(_tile_pixels(grid_x, grid_y),
                        ((0, Tp - T), (0, 0), (0, 0))),
                t0, tl, axis=0,
            )
            full_pay = jnp.concatenate([pay_f, proj.depth[:, None]], axis=-1)

            if config.use_pallas():
                from opengaussian_tpu.ops.rasterize_pallas import (
                    blend_tiles_pallas,
                )

                max_chunks = P_budget // config.chunk + tl

                def one(op_full):
                    opac_m = jnp.where(proj.valid, op_full, 0.0)
                    return blend_tiles_pallas(
                        proj.mean2d, proj.conic, opac_m, full_pay, idx,
                        counts_t, t0[None].astype(jnp.int32), config.chunk,
                        grid_x, max_chunks,
                    )
            else:

                def one(op_full):
                    opac_m = jnp.where(proj.valid, op_full, 0.0)
                    return _blend_tiles(
                        proj.mean2d, proj.conic, opac_m, full_pay, idx,
                        counts_t, pix, config.chunk,
                    )

            def untile(x):
                G = x.shape[0]
                ch = x.shape[-1]
                x = x[:, :T].reshape(G, grid_y, grid_x, TILE, TILE, ch)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    G, grid_y * TILE, grid_x * TILE, ch
                )
                return x[:, :H, :W]

            def body(_, root_id):
                group_ids = root_id * k2 + jnp.arange(k2)
                keep = (leaf_f[None, :] == group_ids[:, None]) & alive_f[None, :]
                counts_g = keep.sum(axis=-1)
                opac_g = jnp.where(keep, opac_f[None, :], 0.0)  # [k2, N]
                accum, t_final = jax.vmap(one)(opac_g)  # [k2,tl,256,C+1]
                blended = jnp.concatenate(
                    [accum[..., :C] + t_final[..., None] * bg_[None, None, None],
                     (1.0 - t_final)[..., None]], axis=-1,
                )
                blended = jax.lax.all_gather(blended, axis, axis=1, tiled=True)
                full = untile(blended)  # [k2, H, W, C+1] replicated
                valid = counts_g >= lang_mod.MIN_LEAF_POINTS
                res = lang_mod.score_leaves(
                    full[..., :C], full[..., C], valid, pm_, pmv_, pmean_,
                    occ_[root_id],
                )
                return None, res

            _, (mid, sc, ok) = jax.lax.scan(body, None, jnp.arange(k1))
            return mid.reshape(-1), sc.reshape(-1), ok.reshape(-1)

        pspec = P(axis)
        cam_spec = jax.tree.map(lambda _: P(), camera)
        return shard_map(
            local, mesh=mesh,
            in_specs=(cam_spec, pspec, pspec, pspec, pspec, pspec, pspec,
                      P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(camera, gs.means, cov, gs.opacity, gs.alive, leaf_ids, feat,
          pm, pm_valid, p_mean, occur_row, fbg)

    return SimpleNamespace(sweep1=sweep1, sweep2=sweep2, lang_view=lang_view)
