"""Rasterizer budget auto-tuning.

The static-shape binning budgets (intersection pool P = multiple * N and the
per-tile list depth K) set the cost of every per-slot operation regardless of
the actual scene load — measured on v5e, shrinking them from the worst-case
defaults (8N, 1024) to a realistic trained-scene fit (4N, 768) takes the full
fwd+bwd step from ~110 ms to ~77 ms at 1296x968/200k splats with zero
dropped or truncated intersections.

`probe(...)` bins a few views under a generous budget and returns the
observed per-splat duplication and per-tile maximum; a probe that saturates
its own per-tile cap escalates (doubling PROBE_K) until the measurement is
unclamped, so the tuner always sees the true need. `tuned_config(...)` sizes
a RasterizeConfig with headroom: at or below the base config when the
headroomed need fits, ABOVE it when the probe proves the scene needs more —
a static budget below the true need means silently truncated blends and
wrong gradients, where the reference's dynamic CUDA allocation
(duplicateWithKeys sizes the key buffer per frame) would simply allocate
more. The trainer re-tunes after capacity growth events and on drop
warnings (budget changes recompile the step, so this happens at the same
cadence as shape growth).
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
PROBE_K = 2048  # starting per-tile cap; doubled on saturation
HEADROOM = 1.3  # scenes evolve between probes (densification, optimization)
WINDOW_K = 768  # stream per-tile window cap: beyond this the tuner keeps K
# shallow and splits deep tiles into virtual windows (tile_windows) — see
# tuned_config and ops/binning's window_depth. 768 (12 chunks) is inside
# the chip-validated budget range (r1-heavy ran ~832); the measured Mosaic
# compile cliff and the scoped-VMEM scratch limit both sit beyond ~1024.


def _band_totals(proj, row_lo, row_hi):
    """Pre-cull expansion-slot need per tile-row band: sum over splats of
    (rect width) x (rect rows inside [row_lo_i, row_hi_i)). This is what
    sizes the BANDED per-device stream (parallel/render.py): culled slots
    still occupy sorted positions, so the budget must cover rect areas, not
    post-cull hit counts. row_lo/row_hi: [B] int32."""
    ry_min = proj.rect_min[:, 1]
    ry_max = proj.rect_max[:, 1]
    w = proj.rect_max[:, 0] - proj.rect_min[:, 0]
    ov = jnp.clip(
        jnp.minimum(ry_max[None, :], row_hi[:, None])
        - jnp.maximum(ry_min[None, :], row_lo[:, None]),
        0, None,
    )
    return jnp.sum(
        jnp.where(proj.num_tiles[None, :] > 0, ov * w[None, :], 0), axis=1
    )  # [B]


WINDOW_K_CANDIDATES = (768, 512, 384, 256, 128)  # probed in one pass so
# windowed_variant() can size shallower-K A/B configs without re-probing


def _window_extra(counts):
    """Extra stream windows needed at each candidate window size: sum over
    tiles of ceil(count / k) - 1, -> [len(WINDOW_K_CANDIDATES)]. Sizes
    config.window_extra so the windowed grid carries no unused tail (the
    default hard bound P // K costs one empty ~1.3 us grid step per unused
    slot)."""
    return jnp.stack([
        jnp.sum(jnp.maximum((counts + k - 1) // k - 1, 0))
        for k in WINDOW_K_CANDIDATES
    ])


@partial(jax.jit, static_argnames=("grid_x", "grid_y", "probe_p", "probe_k"))
def _probe_view(means, cov3d, opac, camera, grid_x: int, grid_y: int,
                probe_p: int, probe_k: int, band_lo=None, band_hi=None):
    proj = project(means, cov3d, camera, opacities=opac)
    bins = bin_gaussians(proj, grid_x, grid_y, probe_p, probe_k)
    bt = (_band_totals(proj, band_lo, band_hi) if band_lo is not None
          else jnp.zeros((1,), jnp.int32))
    return bins.total, jnp.max(bins.counts), jnp.max(bt), \
        _window_extra(bins.counts)


@partial(jax.jit, static_argnames=("grid_x", "grid_y", "probe_p", "probe_k",
                                   "mesh", "axis"))
def _probe_view_sharded(means, cov3d, opac, camera, grid_x: int, grid_y: int,
                        probe_p: int, probe_k: int, mesh, axis: str = "dev"):
    """Gather-free sharded probe with EXACTLY the single-device semantics:
    each device bins its own splats (same circle-tile cull, same clamps) and
    the tiny per-tile count vectors psum — each splat is counted once, on
    its owning device."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(cam, m, c, o, blo, bhi):
        proj = project(m, c, cam, opacities=o)
        bins = bin_gaussians(proj, grid_x, grid_y, probe_p, probe_k)
        total = jax.lax.psum(bins.total, axis)
        counts = jax.lax.psum(bins.counts, axis)
        # per-band pre-cull need over this device's splats, psummed: the
        # banded render clips the GATHERED table, so the global per-band
        # sum is the right measurement
        bt = jax.lax.psum(_band_totals(proj, blo, bhi), axis)
        return total, jnp.max(counts), jnp.max(bt), _window_extra(counts)

    nd = mesh.shape[axis]
    T = grid_x * grid_y
    tl = ((T + nd - 1) // nd * nd) // nd
    lo = np.array([(i * tl) // grid_x for i in range(nd)], np.int32)
    hi = np.array([((i + 1) * tl - 1) // grid_x + 1 for i in range(nd)],
                  np.int32)
    pspec = P(axis)
    cam_spec = jax.tree.map(lambda _: P(), camera)
    return shard_map(
        local, mesh=mesh,
        in_specs=(cam_spec, pspec, pspec, pspec, P(), P()),
        out_specs=(P(), P(), P(), P()), check_vma=False,
    )(camera, means, cov3d, opac, jnp.asarray(lo), jnp.asarray(hi))


def probe(state, cameras, max_views: int = 4, mesh=None, axis: str = "dev",
          band: bool = False):
    """-> (max total intersections, max per-tile count) over sampled views;
    with band=True also the worst per-device BAND need (pre-cull expansion
    slots over any device's tile rows — sizes band_intersection_budget for
    the banded sharded binning). With a mesh, the probe runs
    Gaussian-sharded (no state gather). A view whose per-tile count clamps
    at the probe cap re-probes with a doubled cap, so the returned numbers
    are never self-truncated."""
    cov3d = build_cov3d(state.scales, state.quats)
    opac = jnp.where(state.alive, state.opacity, 0.0)
    n = state.capacity
    probe_p = PROBE_MULTIPLE * n
    worst_total, worst_cnt, worst_band, worst_wx = 0, 0, 0, 0
    step = max(1, len(cameras) // max_views)
    for cam in cameras[::step][:max_views]:
        gx = (cam.width + TILE - 1) // TILE
        gy = (cam.height + TILE - 1) // TILE
        probe_k = PROBE_K
        while True:
            if mesh is not None:
                # the full pool per device: local duplication can exceed the
                # even-shard average, and a dropped slot would undercount
                total, cnt, bt, wx = _probe_view_sharded(
                    state.means, cov3d, opac, cam, gx, gy,
                    probe_p, probe_k, mesh, axis,
                )
            else:
                total, cnt, bt, wx = _probe_view(
                    state.means, cov3d, opac, cam, gx, gy, probe_p, probe_k)
            if int(cnt) < probe_k or probe_k >= n:
                break
            probe_k *= 2  # saturated: the measurement was clamped
        worst_total = max(worst_total, int(total))
        worst_cnt = max(worst_cnt, int(cnt))
        worst_band = max(worst_band, int(bt))
        worst_wx = np.maximum(worst_wx, np.asarray(wx))
    # side channel picked up by tuned_config / windowed_variant: worst
    # extra-window count per WINDOW_K_CANDIDATES entry
    probe.last_window_extras = dict(
        zip(WINDOW_K_CANDIDATES, np.atleast_1d(worst_wx).tolist()))
    if band:
        return worst_total, worst_cnt, worst_band
    return worst_total, worst_cnt


def _round_up(x: float, q: int) -> int:
    return int(np.ceil(x / q) * q)


@partial(jax.jit, static_argnames=("grid_x", "grid_y", "probe_p", "probe_k"))
def _probe_groups_view(means, cov3d, opac_g, camera, grid_x: int, grid_y: int,
                       probe_p: int, probe_k: int):
    """Worst per-group (total, per-tile max) for one view: scan of per-group
    binnings with that group's masked opacities — exactly what
    rasterize_scan_groups executes, so the measurement is the real need."""

    def body(carry, opac):
        proj = project(means, cov3d, camera, opacities=opac)
        bins = bin_gaussians(proj, grid_x, grid_y, probe_p, probe_k)
        return carry, (bins.total, jnp.max(bins.counts))

    _, (tot, cnt) = jax.lax.scan(body, None, opac_g)
    return jnp.max(tot), jnp.max(cnt)


def probe_groups(state, cameras, group_opac: jnp.ndarray, max_views: int = 4):
    """-> (max per-group intersections, max per-group per-tile count) over
    sampled views, for sizing the scan-mode group budgets. group_opac [G, N]:
    per-group masked opacities (e.g. the per-root masks — leaves are subsets
    of their root, so the root probe bounds every group-render call site).
    Same self-escalating cap discipline as `probe`."""
    cov3d = build_cov3d(state.scales, state.quats)
    opac_g = jnp.where(state.alive[None, :], group_opac, 0.0)
    n = state.capacity
    probe_p = PROBE_MULTIPLE * n
    worst_total, worst_cnt = 0, 0
    step = max(1, len(cameras) // max_views)
    for cam in cameras[::step][:max_views]:
        gx = (cam.width + TILE - 1) // TILE
        gy = (cam.height + TILE - 1) // TILE
        probe_k = PROBE_K
        while True:
            total, cnt = _probe_groups_view(
                state.means, cov3d, opac_g, cam, gx, gy, probe_p, probe_k)
            if int(cnt) < probe_k or probe_k >= n:
                break
            probe_k *= 2
        worst_total = max(worst_total, int(total))
        worst_cnt = max(worst_cnt, int(cnt))
    return worst_total, worst_cnt


def tuned_group_config(base: RasterizeConfig, state, cameras,
                       cluster_ids, num_groups: int, max_views: int = 4,
                       headroom: float = HEADROOM) -> RasterizeConfig:
    """Size the scan-mode per-group budgets (group_intersection_budget /
    group_max_per_tile) from a per-root probe. cluster_ids [N]: the coarse
    assignment; the probe masks each root's opacities exactly like
    render_clusters does (keep = member & alive at full opacity — the
    superset of every group-render call site: leaves subset roots, and the
    better_vis scale filters only remove splats). Frame-level budgets are
    left untouched; call on top of tuned_config's result."""
    gids = jnp.arange(num_groups)
    member = cluster_ids[None, :] == gids[:, None]  # [G, N]
    opac_g = jnp.where(member, state.opacity[None, :], 0.0)
    total, cnt = probe_groups(state, cameras, opac_g, max_views)

    want_p = max(total * headroom, 1.0)
    p = _round_up(want_p, 8192)
    want_k = max(cnt * headroom, 2.0 * base.chunk)
    k = _round_up(want_k, base.chunk)
    return dataclasses.replace(
        base, group_intersection_budget=p, group_max_per_tile=k)


def tuned_config(base: RasterizeConfig, state, cameras,
                 max_views: int = 4, mesh=None, axis: str = "dev",
                 headroom: float = HEADROOM) -> RasterizeConfig:
    """Size the budgets to the observed scene with `headroom`. The base
    config caps the result while the headroomed need fits under it; when it
    does not, the budgets grow PAST the base (finely rounded) rather than
    truncate — including the band where the base would have left less than
    the full headroom margin.

    headroom defaults to HEADROOM (1.3): training scenes evolve between
    probes (densification, opacity optimization), and a budget the scene
    outgrows means a drop warning + re-tune recompile. For a STATIC scene
    (inference, benchmarking) the probe maximum over the rendered views is
    exact and a tight fit (e.g. 1.05) is the right call — the reference's
    CUDA rasterizer sizes its key buffer per frame
    (submodules/diff-gaussian-rasterization duplicateWithKeys) and pays
    zero padding, so static-scene comparisons should too. Every per-slot
    binning phase scales with the padded P, not the live total."""
    use_band = mesh is not None and mesh.shape[axis] > 1
    if use_band:
        total, cnt, band_need = probe(state, cameras, max_views, mesh=mesh,
                                      axis=axis, band=True)
    else:
        total, cnt = probe(state, cameras, max_views, mesh=mesh, axis=axis)
    n = state.capacity
    ceiling = base.max_intersections(n)

    want_p = total * headroom if total else float(ceiling)
    p = int(np.clip(_round_up(want_p, 65536), 2 * n, ceiling))
    if p < want_p:  # the base cap bites into the headroom margin -> grow
        p = _round_up(want_p, 8192)

    want_k = cnt * headroom if cnt else float(base.max_per_tile)
    k = int(np.clip(_round_up(want_k, base.chunk), 2 * base.chunk,
                    base.max_per_tile))
    if k < want_k:
        k = _round_up(want_k, base.chunk)
    windows = base.tile_windows
    window_extra = base.window_extra
    if (base.use_pallas() and base.pallas_input == "stream"
            and k > WINDOW_K):
        # deep tiles become stream WINDOWS instead of a deep per-tile
        # budget: Mosaic compile time cliffs beyond K~1024 (measured >6x at
        # K=1472 on v5e) and every tile's stream DMA moves a full K-row
        # window, so K stays at the shallow cap and tiles up to S*K deep
        # split into virtual tiles (binning window_depth; fold in
        # rasterize._fold_windows). The probe's measured extra-window count
        # (probe.last_window_extras side channel) sizes the virtual-tile
        # budget so the grid carries no P//K hard-bound tail.
        windows = int(np.ceil(want_k / WINDOW_K))
        k = WINDOW_K
        wx = getattr(probe, "last_window_extras", {}).get(WINDOW_K, 0)
        window_extra = int(_round_up(max(wx, 1) * headroom, 64))
    band_p = 0
    if use_band:
        # banded sharded binning: each device's stream covers only its own
        # tile rows; see parallel/render.py and the band_intersection_budget
        # field. Capped below the frame budget (a one-row image degenerates
        # to the frame need).
        band_p = min(_round_up(max(band_need * headroom, 1.0), 8192), p)
    return dataclasses.replace(base, intersection_budget=p, max_per_tile=k,
                               band_intersection_budget=band_p,
                               tile_windows=windows,
                               window_extra=window_extra)


def windowed_variant(cfg: RasterizeConfig, window_k: int,
                     headroom: float = HEADROOM) -> RasterizeConfig:
    """A/B variant of a TUNED config at a shallower stream window: K =
    window_k with enough windows to cover the tuned depth. Uses the last
    probe's measured extra-window counts (probe.last_window_extras), so
    call after tuned_config. Rationale: the stream kernels DMA a full
    K-row window per tile whatever its live count, so a shallower K moves
    proportionally fewer bytes for the many light tiles, at the cost of
    extra grid steps + the fold for the few deep ones (bench.py A/Bs the
    trade on-chip)."""
    depth = cfg.max_per_tile * max(cfg.tile_windows, 1)
    S = int(np.ceil(depth / window_k))
    wx = getattr(probe, "last_window_extras", {}).get(window_k, 0)
    extra = int(_round_up(max(wx, 1) * headroom, 64))
    return dataclasses.replace(cfg, max_per_tile=window_k, tile_windows=S,
                               window_extra=extra)
