"""Multi-chip sharded render + train steps (shard_map over a device mesh).

Net-new relative to the single-GPU reference (SURVEY.md §2.3/§5.8). One step:

  phase 1 (sharded over Gaussians): activation + covariance + EWA projection
    on each device's N/d splats;
  phase switch: all_gather of the compact projected splats (a few floats per
    splat) over ICI — the only cross-device traffic in forward;
  phase 2 (sharded over image tiles): every device bins the gathered table
    (cheap integer sort) and alpha-blends only its own tile rows.

Backward reverses automatically: the all_gather transposes to a
reduce-scatter of per-Gaussian gradients back to their owner shards, so
parameter updates stay fully sharded. XLA emits the collectives; nothing is
hand-scheduled.

`render_sharded` carries the full single-device contract (screen-space
gradient tap for densification, radii visibility filter, depth image, budget
health) so every trainer stage can run sharded — see parallel/steps.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.models import gaussians as G
from opengaussian_tpu.models import optimizer as opt_mod
from opengaussian_tpu.ops import blend
from opengaussian_tpu.ops.binning import bin_gaussians
from opengaussian_tpu.ops.projection import TILE, Projected, build_cov3d, project
from opengaussian_tpu.ops.rasterize import RasterizeConfig, _blend_tiles, _tile_pixels
from opengaussian_tpu.ops.sh import sh_to_rgb
from opengaussian_tpu.train import losses


def _gather_proj(proj: Projected, payload, opac, axis: str):
    # The AD transpose of this gather is a psum_scatter (reduce-scatter) of
    # the per-splat gradient tables back to their owner shards. Compiled
    # for a real v5e 2x4 topology (tools/topology_probe.py), XLA's TPU
    # backend rewrites that reduce-scatter into ONE combined sync
    # all-reduce + local slice at small table sizes — see SCALING_r04.json
    # for the measured schedule and the scale at which that changes.
    ag = lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True)
    proj_full = Projected(
        mean2d=ag(proj.mean2d),
        depth=ag(proj.depth),
        conic=ag(proj.conic),
        radius=ag(proj.radius),
        cull_radius=ag(proj.cull_radius),
        rect_min=ag(proj.rect_min),
        rect_max=ag(proj.rect_max),
        num_tiles=ag(proj.num_tiles),
        valid=ag(proj.valid),
    )
    return proj_full, ag(payload), ag(opac)


def render_sharded(
    mesh: Mesh,
    camera: Camera,
    means3d,  # [N,3] sharded P('dev')
    cov3d,
    opacities,
    payload,
    bg,
    config: RasterizeConfig,
    axis: str = "dev",
    screen_tap=None,  # [N,2] sharded; densification gradient tap
):
    """-> (image [H,W,C], alpha [H,W], depth [H,W], radii [N] sharded,
    n_lost []) computed over the mesh."""
    H, W = camera.height, camera.width
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    T = grid_x * grid_y
    nd = mesh.shape[axis]
    Tp = ((T + nd - 1) // nd) * nd
    C = payload.shape[1]
    n_total = means3d.shape[0]
    if screen_tap is None:
        screen_tap = jnp.zeros((n_total, 2))

    def local(cam: Camera, means, cov, opac, pay, tap, bg_):
        r = jax.lax.axis_index(axis)
        tl = Tp // nd
        t0 = r * tl
        proj = project(
            means, cov, cam, screen_tap=tap,
            opacities=opac if config.tight_radius else None,
        )
        radii_local = proj.radius
        proj, pay_f, opac_f = _gather_proj(proj, pay, opac, axis)
        use_stream = config.use_pallas() and config.pallas_input == "stream"
        use_band = config.band_intersection_budget > 0
        if use_band:
            # banded binning: clip the gathered table to this device's tile
            # rows so expansion/sort/gathers cover ~1/D of the frame's slots
            # (pixel-exact — see clip_rect_rows; the replicated full-frame
            # binning was the modeled N-chip scaling ceiling)
            from opengaussian_tpu.ops.projection import clip_rect_rows

            proj = clip_rect_rows(proj, t0 // grid_x,
                                  (t0 + tl - 1) // grid_x + 1)
            P_budget = config.band_intersection_budget
        else:
            P_budget = config.max_intersections(n_total)
        opac_m = jnp.where(proj.valid, opac_f, 0.0)
        full_pay = jnp.concatenate([pay_f, proj.depth[:, None]], axis=-1)
        carry = None
        if use_stream:
            carry = jax.lax.stop_gradient(jnp.concatenate(
                [proj.mean2d, proj.conic, opac_m[:, None], full_pay], axis=-1
            ))
        bins = bin_gaussians(
            proj, grid_x, grid_y, P_budget, config.max_per_tile,
            tile_lo=t0 if use_band else 0,
            band_size=tl if use_band else None,
            dense=not use_stream, stream=use_stream, carry=carry,
            window_depth=(config.tile_windows
                          if use_stream and use_band else 0),
            window_extra=config.window_extra,
        )
        if use_band:
            counts = bins.counts  # this band's rows ([tl], or virtual)
        else:
            counts = jax.lax.dynamic_slice_in_dim(
                jnp.pad(bins.counts, (0, Tp - T)), t0, tl, axis=0
            )
        pix = jax.lax.dynamic_slice_in_dim(
            jnp.pad(_tile_pixels(grid_x, grid_y), ((0, Tp - T), (0, 0), (0, 0))),
            t0, tl, axis=0,
        )
        if use_stream:
            from opengaussian_tpu.ops.rasterize_pallas import (
                blend_tiles_pallas_stream,
            )

            # padded tail tiles point at the stream end: count 0, reads land
            # in the kernel's zero padding
            tstart = bins.tile_start if use_band else \
                jax.lax.dynamic_slice_in_dim(
                    jnp.pad(bins.tile_start, (0, Tp - T),
                            constant_values=P_budget),
                    t0, tl, axis=0,
                )
            n_vt = counts.shape[0]  # tl, or the virtual-tile count
            toff = (t0 + bins.vt_real if bins.vt_real is not None
                    else t0 + jnp.arange(n_vt, dtype=jnp.int32))
            max_chunks = P_budget // config.chunk + n_vt
            accum, t_final = blend_tiles_pallas_stream(
                proj.mean2d, proj.conic, opac_m, full_pay, bins.sorted_carry,
                bins.sorted_gauss, tstart, counts,
                toff.astype(jnp.int32), None, config.chunk,
                grid_x, max_chunks, config.max_per_tile,
                config.reduce_backend, config.bwd_layout,
            )
            if bins.vt_real is not None:
                from opengaussian_tpu.ops.rasterize import _fold_windows

                accum, t_final = _fold_windows(
                    accum, t_final, bins.vt_first, bins.vt_n,
                    config.tile_windows,
                )
        else:
            if use_band:
                idx = bins.gauss_idx  # already this band's [tl, K]
            else:
                idx = jax.lax.dynamic_slice_in_dim(
                    jnp.pad(bins.gauss_idx, ((0, Tp - T), (0, 0))), t0, tl,
                    axis=0,
                )
            if config.use_pallas():
                from opengaussian_tpu.ops.rasterize_pallas import (
                    blend_tiles_pallas,
                )

                max_chunks = P_budget // config.chunk + tl
                accum, t_final = blend_tiles_pallas(
                    proj.mean2d, proj.conic, opac_m, full_pay, idx, counts,
                    t0[None].astype(jnp.int32), config.chunk, grid_x,
                    max_chunks,
                )
            else:
                accum, t_final = _blend_tiles(
                    proj.mean2d, proj.conic, opac_m, full_pay, idx, counts,
                    pix, config.chunk,
                )
        img = accum[:, :, :C] + t_final[..., None] * bg_[None, None, :]
        depth = accum[:, :, C]
        n_lost = bins.n_dropped + bins.n_truncated
        if use_band:
            # per-device band losses (each tile owned by one device)
            n_lost = jax.lax.psum(n_lost, axis)
        # else: identical on all devices
        return img, 1.0 - t_final, depth, radii_local, n_lost

    pspec = P(axis)
    cam_spec = jax.tree.map(lambda _: P(), camera)
    img_tiles, alpha_tiles, depth_tiles, radii, n_lost = shard_map(
        local,
        mesh=mesh,
        in_specs=(cam_spec, pspec, pspec, pspec, pspec, pspec, P()),
        out_specs=(pspec, pspec, pspec, pspec, P()),
        check_vma=False,
    )(camera, means3d, cov3d, opacities, payload, screen_tap, bg)

    def untile(x):
        ch = x.shape[-1]
        x = x[:T].reshape(grid_y, grid_x, TILE, TILE, ch)
        x = x.transpose(0, 2, 1, 3, 4).reshape(grid_y * TILE, grid_x * TILE, ch)
        return x[:H, :W]

    return (
        untile(img_tiles),
        untile(alpha_tiles[..., None])[..., 0],
        untile(depth_tiles[..., None])[..., 0],
        radii,
        n_lost,
    )


def make_sharded_train_step(mesh: Mesh, camera: Camera, config: RasterizeConfig,
                            ocfg, spatial_lr_scale: float = 1.0, axis: str = "dev"):
    """Backwards-compatible stage-0 RGB step factory with a baked-in camera.
    The full five-stage sharded trainer lives in parallel/steps.py; this
    remains for simple benchmarking (fixed camera => one compile)."""
    from opengaussian_tpu.parallel.steps import make_sharded_steps

    steps = make_sharded_steps(mesh, config, ocfg, spatial_lr_scale, axis=axis)

    @jax.jit
    def step(state: G.GaussianState, adam, stats: G.DensifyStats, gt, iteration, bg):
        state, adam, stats, loss, aux = steps.stage0(
            state, adam, stats, camera, gt, None, iteration, bg
        )
        return state, adam, loss, aux["image"]

    return step
