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


def probe(state, cameras, max_views: int = 4):
    """-> (max total intersections, max per-tile count) over sampled views."""
    cov3d = build_cov3d(state.scales, state.quats)
    opac = jnp.where(state.alive, state.opacity, 0.0)
    n = state.capacity
    probe_p = PROBE_MULTIPLE * n
    worst_total, worst_cnt = 0, 0
    step = max(1, len(cameras) // max_views)
    for cam in cameras[::step][:max_views]:
        gx = (cam.width + TILE - 1) // TILE
        gy = (cam.height + TILE - 1) // TILE
        total, cnt = _probe_view(state.means, cov3d, opac, cam, gx, gy, probe_p)
        worst_total = max(worst_total, int(total))
        worst_cnt = max(worst_cnt, int(cnt))
    return worst_total, worst_cnt


def tuned_config(base: RasterizeConfig, state, cameras,
                 max_views: int = 4) -> RasterizeConfig:
    """Size the budgets to the observed scene with HEADROOM, never above the
    base config (which acts as the worst-case ceiling)."""
    total, cnt = probe(state, cameras, max_views)
    n = state.capacity
    ceiling = base.max_intersections(n)
    p = int(np.ceil(total * HEADROOM / 65536) * 65536) if total else ceiling
    p = int(np.clip(p, 2 * n, ceiling))
    k = int(np.ceil(cnt * HEADROOM / base.chunk) * base.chunk) if cnt else base.max_per_tile
    k = int(np.clip(k, 2 * base.chunk, base.max_per_tile))
    return dataclasses.replace(base, intersection_budget=p, max_per_tile=k)
