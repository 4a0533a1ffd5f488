"""Multi-chip sharded render + train step (shard_map over a device mesh).

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
):
    """Returns (image [H,W,C], alpha [H,W]) computed over the mesh."""
    H, W = camera.height, camera.width
    grid_x = (W + TILE - 1) // TILE
    grid_y = (H + TILE - 1) // TILE
    T = grid_x * grid_y
    nd = mesh.shape[axis]
    Tp = ((T + nd - 1) // nd) * nd
    C = payload.shape[1]
    n_total = means3d.shape[0]

    def local(means, cov, opac, pay, bg_):
        r = jax.lax.axis_index(axis)
        proj = project(means, cov, camera)
        proj, pay_f, opac_f = _gather_proj(proj, pay, opac, axis)
        bins = bin_gaussians(
            proj, grid_x, grid_y,
            config.max_intersections(n_total), config.max_per_tile,
        )
        tl = Tp // nd
        t0 = r * tl
        idx = jax.lax.dynamic_slice_in_dim(
            jnp.pad(bins.gauss_idx, ((0, Tp - T), (0, 0))), t0, tl, axis=0
        )
        counts = jax.lax.dynamic_slice_in_dim(
            jnp.pad(bins.counts, (0, Tp - T)), t0, tl, axis=0
        )
        pix = jax.lax.dynamic_slice_in_dim(
            jnp.pad(_tile_pixels(grid_x, grid_y), ((0, Tp - T), (0, 0), (0, 0))),
            t0, tl, axis=0,
        )
        opac_m = jnp.where(proj.valid, opac_f, 0.0)
        full_pay = jnp.concatenate([pay_f, proj.depth[:, None]], axis=-1)
        if config.use_pallas():
            from opengaussian_tpu.ops.rasterize_pallas import blend_tiles_pallas

            max_chunks = (
                config.max_intersections(n_total) // config.chunk + tl
            )
            accum, t_final = blend_tiles_pallas(
                proj.mean2d, proj.conic, opac_m, full_pay, idx, counts,
                t0[None].astype(jnp.int32), config.chunk, grid_x, max_chunks,
            )
        else:
            accum, t_final = _blend_tiles(
                proj.mean2d, proj.conic, opac_m, full_pay, idx, counts, pix,
                config.chunk,
            )
        img = accum[:, :, :C] + t_final[..., None] * bg_[None, None, :]
        return img, 1.0 - t_final

    pspec = P(axis)
    img_tiles, alpha_tiles = shard_map(
        local,
        mesh=mesh,
        in_specs=(pspec, pspec, pspec, pspec, P()),
        out_specs=(pspec, pspec),
        check_vma=False,
    )(means3d, cov3d, opacities, payload, bg)

    def untile(x):
        ch = x.shape[-1]
        x = x[:T].reshape(grid_y, grid_x, TILE, TILE, ch)
        x = x.transpose(0, 2, 1, 3, 4).reshape(grid_y * TILE, grid_x * TILE, ch)
        return x[:H, :W]

    return untile(img_tiles), untile(alpha_tiles[..., None])[..., 0]


def make_sharded_train_step(mesh: Mesh, camera: Camera, config: RasterizeConfig,
                            ocfg, spatial_lr_scale: float = 1.0, axis: str = "dev"):
    """Full stage-0 training step (render -> loss -> grads -> Adam) with
    Gaussian-sharded parameters. Returns a jitted step function."""

    @jax.jit
    def step(state: G.GaussianState, adam, stats: G.DensifyStats, gt, iteration, bg):
        def loss_fn(params):
            gs = state.with_params(params)
            rgb = sh_to_rgb(3, gs.sh, gs.means, camera.cam_center)
            cov3d = build_cov3d(gs.scales, gs.quats)
            img, alpha = render_sharded(
                mesh, camera, gs.means, cov3d, gs.opacity, rgb, bg, config, axis
            )
            return losses.rgb_loss(img, gt, ocfg.lambda_dssim), img

        (loss, img), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params())
        lrs = opt_mod.learning_rates(ocfg, iteration, spatial_lr_scale)
        new_p, adam2 = opt_mod.apply(state.params(), grads, adam, lrs)
        return state.with_params(new_p), adam2, loss, img

    return step
