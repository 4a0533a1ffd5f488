"""Rasterizer budget auto-tuning.

The static-shape binning budgets (intersection pool P = multiple * N and the
per-tile list depth K) set the cost of every per-slot operation regardless of
the actual scene load — measured on v5e, shrinking them from the worst-case
defaults (8N, 1024) to a realistic trained-scene fit (4N, 768) takes the full
fwd+bwd step from ~110 ms to ~77 ms at 1296x968/200k splats with zero
dropped or truncated intersections.

`probe(...)` bins a few views under a generous budget and returns the
observed per-splat duplication and per-tile maximum; `tuned_config(...)`
sizes a RasterizeConfig with headroom. The trainer re-tunes after capacity
growth events (budget changes recompile the step, so this happens at the
same cadence as shape growth).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.ops.binning import bin_gaussians
from opengaussian_tpu.ops.projection import TILE, build_cov3d, project
from opengaussian_tpu.ops.rasterize import RasterizeConfig

PROBE_MULTIPLE = 10  # generous pool so the probe itself never saturates
PROBE_K = 2048
HEADROOM = 1.3  # scenes evolve between probes (densification, optimization)


@partial(jax.jit, static_argnames=("grid_x", "grid_y", "probe_p"))
def _probe_view(means, cov3d, opac, camera, grid_x: int, grid_y: int,
                probe_p: int):
    proj = project(means, cov3d, camera, opacities=opac)
    bins = bin_gaussians(proj, grid_x, grid_y, probe_p, PROBE_K)
    return bins.total, jnp.max(bins.counts)


@partial(jax.jit, static_argnames=("grid_x", "grid_y", "mesh", "axis"))
def _probe_view_sharded(means, cov3d, opac, camera, grid_x: int, grid_y: int,
                        mesh, axis: str = "dev"):
    """Gather-free sharded probe: each device projects its own splats and
    scatters their tile rects into a 2-D difference array; one psum of the
    tiny [gy+1, gx+1] grid + a double cumsum yields the exact per-tile cover
    counts (== untruncated bins.counts) without running the binning sort or
    gathering the splat table."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(cam, m, c, o):
        proj = project(m, c, cam, opacities=o)
        total = jax.lax.psum(jnp.sum(proj.num_tiles), axis)
        w = (proj.num_tiles > 0).astype(jnp.float32)
        x0, y0 = proj.rect_min[:, 0], proj.rect_min[:, 1]
        x1, y1 = proj.rect_max[:, 0], proj.rect_max[:, 1]
        diff = jnp.zeros((grid_y + 1, grid_x + 1), jnp.float32)
        diff = diff.at[y0, x0].add(w, mode="drop")
        diff = diff.at[y0, x1].add(-w, mode="drop")
        diff = diff.at[y1, x0].add(-w, mode="drop")
        diff = diff.at[y1, x1].add(w, mode="drop")
        diff = jax.lax.psum(diff, axis)
        counts = jnp.cumsum(jnp.cumsum(diff, axis=0), axis=1)[:grid_y, :grid_x]
        return total, jnp.max(counts).astype(jnp.int32)

    pspec = P(axis)
    cam_spec = jax.tree.map(lambda _: P(), camera)
    return shard_map(
        local, mesh=mesh, in_specs=(cam_spec, pspec, pspec, pspec),
        out_specs=(P(), P()), check_vma=False,
    )(camera, means, cov3d, opac)


def probe(state, cameras, max_views: int = 4, mesh=None, axis: str = "dev"):
    """-> (max total intersections, max per-tile count) over sampled views.
    With a mesh, the probe runs Gaussian-sharded (no state gather)."""
    cov3d = build_cov3d(state.scales, state.quats)
    opac = jnp.where(state.alive, state.opacity, 0.0)
    n = state.capacity
    probe_p = PROBE_MULTIPLE * n
    worst_total, worst_cnt = 0, 0
    step = max(1, len(cameras) // max_views)
    for cam in cameras[::step][:max_views]:
        gx = (cam.width + TILE - 1) // TILE
        gy = (cam.height + TILE - 1) // TILE
        if mesh is not None:
            total, cnt = _probe_view_sharded(
                state.means, cov3d, opac, cam, gx, gy, mesh, axis
            )
        else:
            total, cnt = _probe_view(state.means, cov3d, opac, cam, gx, gy,
                                     probe_p)
        worst_total = max(worst_total, int(total))
        worst_cnt = max(worst_cnt, int(cnt))
    return worst_total, worst_cnt


def tuned_config(base: RasterizeConfig, state, cameras,
                 max_views: int = 4, mesh=None, axis: str = "dev") -> RasterizeConfig:
    """Size the budgets to the observed scene with HEADROOM. The base config
    caps the *headroom* growth, but a probe that PROVES the scene needs more
    than the base (overdraw past base.max_per_tile, or a total above the base
    pool) grows past it: a static budget below the true need means silently
    truncated blends and wrong gradients, where the reference's dynamic CUDA
    allocation (duplicateWithKeys sizes the key buffer per frame) would simply
    allocate more."""
    total, cnt = probe(state, cameras, max_views, mesh=mesh, axis=axis)
    n = state.capacity
    ceiling = base.max_intersections(n)
    p = int(np.ceil(total * HEADROOM / 65536) * 65536) if total else ceiling
    p = int(np.clip(p, 2 * n, ceiling))
    if total > ceiling:  # proven need above the base cap -> grow
        p = int(np.ceil(total * HEADROOM / 8192) * 8192)
    k = int(np.ceil(cnt * HEADROOM / base.chunk) * base.chunk) if cnt else base.max_per_tile
    k = int(np.clip(k, 2 * base.chunk, base.max_per_tile))
    if cnt > base.max_per_tile:  # proven overdraw above the base cap -> grow
        k = int(np.ceil(cnt * HEADROOM / base.chunk) * base.chunk)
    return dataclasses.replace(base, intersection_budget=p, max_per_tile=k)
