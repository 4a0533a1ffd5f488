"""Differentiable tile rasterizer (XLA path).

The production render path: project -> bin -> per-tile chunked alpha-blend.
This replaces the reference's CUDA diff-gaussian-rasterization submodule
(import site: reference gaussian_renderer/__init__.py:15; API contract in
SURVEY.md §2.1) with a TPU-first design:

  * arbitrary C-channel payloads (SH color, instance features, depth) are
    composited in ONE pass, instead of the reference's 2-4 sequential
    3-channel rasterizations (reference gaussian_renderer/__init__.py:129-163);
  * the per-tile blend is a lax.scan over depth-ordered chunks whose inner
    step is dense [tiles, chunk, 256] VPU work plus one [256 x chunk] @
    [chunk x C] MXU contraction per tile — no per-pixel loops;
  * the backward pass is a custom VJP that *replays* the forward scan
    (storing only the final transmittance and the premultiplied accumulation,
    like the CUDA backward replays from its saved final state) and emits
    per-splat gradients with a segment-sum scatter.

Gradients w.r.t. means3d/scales/quats/opacity/SH/payload flow through
`project` by ordinary autodiff; only the blend carries the custom VJP.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opengaussian_tpu.cameras import Camera
from opengaussian_tpu.ops import blend
from opengaussian_tpu.ops.binning import TileBins, bin_gaussians, depth_rank
from opengaussian_tpu.ops.projection import TILE, Projected, project


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static rasterizer budgets (part of the jit cache key)."""

    max_per_tile: int = 1024  # K: depth-ordered splats kept per tile
    chunk: int = 64  # splats blended per scan step
    intersection_multiple: int = 8  # P_max = multiple * N (rounded up)
    min_intersections: int = 65536
    # exact intersection budget (0 = derive from intersection_multiple);
    # set by ops/budget.py auto-tuning to avoid integer-multiple waste
    intersection_budget: int = 0
    # blend backend: "auto" = fused Pallas kernel on TPU / XLA scan elsewhere;
    # "pallas" forces the kernel (interpret mode off-TPU, for tests);
    # "xla" forces the scan path.
    backend: str = "auto"
    # opacity-aware cutoff radius (pixel-exact, touches fewer tiles than the
    # classic 3-sigma rect; radii outputs shrink for translucent splats)
    tight_radius: bool = True
    # Pallas input layout: "stream" = kernels DMA each tile's run straight
    # out of the sorted slot stream (no dense [T, K] matrix, no dense
    # gather/scatter in binning); "dense" = the round-1 [T, K, F] BlockSpec
    # staging (always used for vmapped group renders)
    pallas_input: str = "stream"
    # backward per-splat gradient reduction (stream path): "scatter" =
    # jax.ops.segment_sum; "sorted_mxu" = sort-by-id + windowed one-hot MXU
    # contraction (rasterize_pallas.sorted_segment_reduce); "auto" = the
    # module default (rasterize_pallas.REDUCE_BACKEND)
    reduce_backend: str = "auto"
    # backward d_slot layout (stream path): "dense" = [T, K, F] BlockSpec
    # blocks + an XLA chunk-compaction gather; "compact" = the kernel DMAs
    # each live chunk's gradient rows straight to its compacted offset
    # (no dense buffer, no gather); "auto" = the module default
    # (rasterize_pallas.BWD_LAYOUT)
    bwd_layout: str = "auto"
    # group-render backend: "scan" = lax.scan of per-group single-group
    # rasterizes (each group re-bins with its own masked opacities, so the
    # tight-radius cull shrinks every per-group stream to that group's own
    # splats and the Pallas STREAM kernels apply — total blend work across a
    # partition is ~one full-scene pass); "dense" = the round-1 design (one
    # shared union binning, the blend vmapped over per-group opacity masks
    # through the dense [T, K, F] twin — every group pays a full union
    # walk); "auto" = scan
    group_render: str = "auto"
    # tile WINDOWING (stream layout): S > 0 lets a tile hold up to
    # S * max_per_tile slots by splitting it into consecutive virtual tiles
    # of <= max_per_tile each (binning vt_* fields; composited by
    # rasterize._fold_windows). Keeps max_per_tile at a shallow
    # compile-friendly window on deep scenes — Mosaic compile time cliffs
    # beyond K~1024 and the per-tile stream DMA always moves K rows. Sized
    # by ops/budget.tuned_config (WINDOW_K cap). Numerics: the T < 1e-4
    # early-termination rule applies to each window's LOCAL transmittance,
    # so slots the reference rule would drop after a global crossing still
    # composite within later windows — the result lies between the
    # reference-cutoff blend and the exact uncut blend, differing from
    # either by at most the leftover T_EPS = 1e-4 per pixel (the cutoff is
    # an optimization, not a semantic; tests/test_windows.py pins the
    # bound).
    tile_windows: int = 0
    # virtual-tile budget: total extra windows across the frame
    # (0 = the hard bound P // max_per_tile, which can never overflow)
    window_extra: int = 0
    # per-device slot budget for BANDED sharded binning (parallel/render.py):
    # each device clips the gathered table to its own tile rows
    # (projection.clip_rect_rows) and expands/sorts only those slots, so
    # every per-slot binning phase scales ~1/D instead of being replicated
    # per device (the modeled scaling ceiling — tools/scaling_model.py).
    # 0 = replicated binning (each device bins the full frame at the frame
    # budget). Sized by ops/budget.tuned_config under a mesh from the
    # probe's per-band row sums.
    band_intersection_budget: int = 0
    # dedicated budgets for per-group binning under group_render="scan"
    # (0 = fall back to the main budgets). A single group holds ~N/G of the
    # scene, so its tight-fit budget is ~G x smaller than the frame budget —
    # and every per-slot binning phase scales with the padded budget.
    # ops/budget.tuned_group_config sizes these from a per-group probe.
    group_intersection_budget: int = 0
    group_max_per_tile: int = 0

    def group_config(self) -> "RasterizeConfig":
        """The config a single group's rasterize runs under (scan mode)."""
        upd = {}
        if self.group_intersection_budget:
            upd["intersection_budget"] = self.group_intersection_budget
        if self.group_max_per_tile:
            upd["max_per_tile"] = self.group_max_per_tile
        return dataclasses.replace(self, **upd) if upd else self

    def max_intersections(self, n: int) -> int:
        if self.intersection_budget:
            return max(self.intersection_budget, self.min_intersections)
        return max(self.intersection_multiple * n, self.min_intersections)

    def use_pallas(self) -> bool:
        if self.backend == "auto":
            return jax.default_backend() == "tpu"
        return self.backend == "pallas"


def _tile_pixels(grid_x: int, grid_y: int) -> jnp.ndarray:
    """[T, 256, 2] float pixel coords for every tile (pixf = integer index)."""
    t = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    ox = (t % grid_x) * TILE
    oy = (t // grid_x) * TILE
    py, px = jnp.meshgrid(jnp.arange(TILE), jnp.arange(TILE), indexing="ij")
    px = px.reshape(-1)
    py = py.reshape(-1)
    return jnp.stack(
        [ox[:, None] + px[None, :], oy[:, None] + py[None, :]], axis=-1
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# blend with custom VJP
# inputs: mean2d [N,2], conic [N,3], opac [N], payload [N,C]
# plumbing (non-diff): idx [T,K], counts [T], pix [T,256,2]
# outputs: accum [T,256,C] premultiplied, t_final [T,256]
# ---------------------------------------------------------------------------


def _chunk_alpha(mean2d, conic, opac, pix, ids, kmask):
    m = mean2d[ids]  # [T,Kc,2]
    c = conic[ids]
    o = jnp.where(kmask, opac[ids], 0.0)
    return blend.alpha_from_conic(m, c, o, pix)  # [T,Kc,256]


@partial(jax.custom_vjp, nondiff_argnums=(7,))
def _blend_tiles(mean2d, conic, opac, payload, idx, counts, pix, chunk):
    return _blend_fwd_impl(mean2d, conic, opac, payload, idx, counts, pix, chunk)[0]


def _blend_fwd_impl(mean2d, conic, opac, payload, idx, counts, pix, chunk):
    T_, K = idx.shape
    P = pix.shape[1]
    C = payload.shape[1]
    nsteps = K // chunk
    assert nsteps * chunk == K, "max_per_tile must be a multiple of chunk"

    def step(carry, i):
        bc, accum = carry
        ids = jax.lax.dynamic_slice_in_dim(idx, i * chunk, chunk, axis=1)
        kmask = (i * chunk + jnp.arange(chunk, dtype=jnp.int32))[None, :] < counts[:, None]
        alpha = _chunk_alpha(mean2d, conic, opac, pix, ids, kmask)
        w, bc = blend.blend_chunk(alpha, bc)
        accum = accum + jnp.einsum(
            "tkp,tkc->tpc", w, payload[ids], preferred_element_type=jnp.float32
        )
        return (bc, accum), None

    bc0 = blend.init_carry((T_, P))
    accum0 = jnp.zeros((T_, P, C), jnp.float32)
    (bc, accum), _ = jax.lax.scan(
        step, (bc0, accum0), jnp.arange(nsteps, dtype=jnp.int32)
    )
    return (accum, bc.T), bc


def _blend_fwd(mean2d, conic, opac, payload, idx, counts, pix, chunk):
    out, _ = _blend_fwd_impl(mean2d, conic, opac, payload, idx, counts, pix, chunk)
    accum, t_final = out
    res = (mean2d, conic, opac, payload, idx, counts, pix, accum, t_final)
    return out, res


def _blend_bwd(chunk, res, cts):
    mean2d, conic, opac, payload, idx, counts, pix, accum, t_final = res
    g_accum, g_t = cts  # [T,256,C], [T,256]
    T_, K = idx.shape
    C = payload.shape[1]
    nsteps = K // chunk

    # scalar field per pixel: cotangent-weighted premultiplied accumulation
    ga_total = jnp.sum(g_accum * accum, axis=-1)  # [T,256]

    def step(carry, i):
        bc, B, d_mean2d, d_conic, d_opac, d_payload = carry
        ids = jax.lax.dynamic_slice_in_dim(idx, i * chunk, chunk, axis=1)
        kmask = (i * chunk + jnp.arange(chunk, dtype=jnp.int32))[None, :] < counts[:, None]

        m = mean2d[ids]
        cn = conic[ids]
        o = jnp.where(kmask, opac[ids], 0.0)
        alpha_raw = blend.alpha_from_conic(m, cn, o, pix)  # [T,Kc,256]
        w, bc_new = blend.blend_chunk(alpha_raw, bc)
        contrib = w > 0.0
        a = jnp.minimum(alpha_raw, blend.ALPHA_MAX)
        t_prev = jnp.where(contrib, w / a, 0.0)  # T before each splat

        pay = payload[ids]  # [T,Kc,C]
        # dL/dpayload per slot
        d_pay_slot = jnp.einsum(
            "tkp,tpc->tkc", w, g_accum, preferred_element_type=jnp.float32
        )
        # gc[t,k,p] = sum_c g_accum * payload_k  (cotangent of the premult sum)
        gc = jnp.einsum("tpc,tkc->tkp", g_accum, pay, preferred_element_type=jnp.float32)
        # B_k = sum_c g_accum * A_k (inclusive premult accumulation): carries
        u = w * gc
        B_inc = B[:, None, :] + jnp.cumsum(u, axis=1)
        # d alpha: suffix term S_k = A_total - A_k, plus the T_final path
        one_m_a = jnp.maximum(1.0 - a, 1.0 - blend.ALPHA_MAX)
        d_alpha = jnp.where(
            contrib,
            t_prev * gc
            - (ga_total[:, None, :] - B_inc) / one_m_a
            - (g_t * t_final)[:, None, :] / one_m_a,
            0.0,
        )
        # alpha saturation: min(0.99, .) kills the gradient when clamped
        d_alpha = jnp.where(alpha_raw < blend.ALPHA_MAX, d_alpha, 0.0)

        # alpha = o * exp(power); d power = alpha * d_alpha
        dx = m[..., 0:1] - pix[..., None, :, 0]  # [T,Kc,P]
        dy = m[..., 1:2] - pix[..., None, :, 1]
        d_power = a * d_alpha
        ca, cb, cc = cn[..., 0:1], cn[..., 1:2], cn[..., 2:3]
        d_mx = jnp.sum(d_power * -(ca * dx + cb * dy), axis=-1)
        d_my = jnp.sum(d_power * -(cc * dy + cb * dx), axis=-1)
        d_ca = jnp.sum(d_power * (-0.5 * dx * dx), axis=-1)
        d_cb = jnp.sum(d_power * (-dx * dy), axis=-1)
        d_cc = jnp.sum(d_power * (-0.5 * dy * dy), axis=-1)
        o_safe = jnp.where(o > 0.0, o, 1.0)
        d_o = jnp.sum(d_alpha * a, axis=-1) / o_safe  # exp(power) = a / o

        flat = ids.reshape(-1)
        d_mean2d = d_mean2d.at[flat].add(
            jnp.stack([d_mx, d_my], axis=-1).reshape(-1, 2)
        )
        d_conic = d_conic.at[flat].add(
            jnp.stack([d_ca, d_cb, d_cc], axis=-1).reshape(-1, 3)
        )
        d_opac = d_opac.at[flat].add(d_o.reshape(-1))
        d_payload = d_payload.at[flat].add(d_pay_slot.reshape(-1, C))

        B_out = B + jnp.sum(u, axis=1)
        return (bc_new, B_out, d_mean2d, d_conic, d_opac, d_payload), None

    bc0 = blend.init_carry((T_, pix.shape[1]))
    carry0 = (
        bc0,
        jnp.zeros((T_, pix.shape[1]), jnp.float32),
        jnp.zeros_like(mean2d),
        jnp.zeros_like(conic),
        jnp.zeros_like(opac),
        jnp.zeros_like(payload),
    )
    (bc, _, d_mean2d, d_conic, d_opac, d_payload), _ = jax.lax.scan(
        step, carry0, jnp.arange(nsteps, dtype=jnp.int32)
    )
    zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (
        d_mean2d,
        d_conic,
        d_opac,
        d_payload,
        zero_i(idx),
        zero_i(counts),
        jnp.zeros_like(pix),
    )


_blend_tiles.defvjp(_blend_fwd, _blend_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RasterOut:
    image: Any  # [H,W,C] composited payload (premultiplied + T*bg)
    alpha: Any  # [H,W] 1 - final transmittance
    depth: Any  # [H,W] premultiplied expected depth
    radii: Any  # [N] int32, 0 => culled (visibility filter)
    n_dropped: Any  # [] int32 budget diagnostics
    n_truncated: Any  # [] int32


class FrozenPlan(NamedTuple):
    """Per-view binning + reduction plan for FROZEN geometry.

    Past stage 0 only ins_feat trains (models/optimizer.py zeroes every
    geometry LR), so projection rects, depth ranks, the (tile, rank) sort
    order, per-tile ranges, and the backward's reduction order are all
    LOOP-INVARIANT per (camera, budgets). This caches the integer plumbing
    (~[P] int32 x 2 per view); per step the whole binning collapses to ONE
    row gather of the current carry by `g_sorted` (the expand / pack gather
    / key sort / searchsorted chain — ~12 ms of a recipe-shape step — is
    skipped), and the backward's by-id sort becomes a cached-permutation
    gather (ReducePlan).

    Rescale semantics, PROVIDED the plan is truncation-free (n_truncated ==
    0 == n_dropped — the trainer's tuned budgets guarantee it; under
    K-truncation the superset window drops DEEPER real slots than a tight
    binning would keep and results fork arbitrarily):

      * at the plan's own covariance (rescale 1.0 — stage 1 always, half of
        the stage-2.x steps): EXACT, same sorted stream bit for bit;
      * at a SMALLER covariance (the trainer's random rescale_factor < 1):
        the plan's pair list is a superset of the tight rescaled list.
        Extra pairs beyond the opacity-aware cutoff evaluate to alpha <
        1/255 and the blend's rule-1 skip (ops/blend.py:60,
        rasterize_pallas.py:146) zeroes them exactly. Where the effective
        radius is instead the classic 3-sigma bound (projection.py:162
        takes min(3sigma, r_cut)), the rescaled tight binning drops tail
        pairs with alpha up to o*e^-4.5 ~ 0.011 that the plan KEEPS — the
        frozen render composites slightly MORE of the true Gaussian tail
        than a fresh rescaled binning (measured <= 6e-3 on ~1% of pixels,
        tests/test_frozen.py). This is the same order of approximation the
        reference accepts from its own 3-sigma cut, on the more-exact side.

    tests/test_frozen.py pins the exact and the bounded-deviation cases."""

    g_sorted: Any  # [P] int32 splat per sorted slot
    tstart: Any  # [Tv] int32
    counts: Any  # [Tv] int32
    vt_real: Any  # windowing maps or None (TileBins contract)
    vt_first: Any
    vt_n: Any
    total: Any  # [] int32 (diagnostics, from the build)
    n_dropped: Any
    n_truncated: Any
    reduce: Any  # rasterize_pallas.ReducePlan or None


def build_frozen_plan(camera, means3d, cov3d, opacities,
                      config: RasterizeConfig) -> FrozenPlan:
    """Build the per-view FrozenPlan (jit-able; run once per view).

    Must be called with the SAME camera / geometry / config the frozen
    steps will use, at rescale_factor == 1 (the superset plan). Only the
    Pallas stream path consumes plans (the production single-chip blend)."""
    assert config.use_pallas() and config.pallas_input == "stream", (
        "frozen plans require the Pallas stream path")
    grid_x = (camera.width + TILE - 1) // TILE
    grid_y = (camera.height + TILE - 1) // TILE
    proj: Projected = project(
        means3d, cov3d, camera,
        opacities=opacities if config.tight_radius else None,
    )
    n = means3d.shape[0]
    bins = bin_gaussians(
        proj, grid_x, grid_y, config.max_intersections(n),
        config.max_per_tile, dense=False, stream=True,
        window_depth=config.tile_windows, window_extra=config.window_extra,
    )
    reduce_plan = None
    from opengaussian_tpu.ops import rasterize_pallas as rp

    backend = (rp.REDUCE_BACKEND if config.reduce_backend == "auto"
               else config.reduce_backend)
    if backend == "sorted_mxu" and n <= 2**24:
        n_band = bins.counts.shape[0]
        NC = config.max_intersections(n) // config.chunk + n_band
        ids = rp.chunk_space_ids(
            bins.sorted_gauss, bins.tile_start, bins.counts, config.chunk,
            NC, n, config.max_per_tile,
        )
        reduce_plan = rp.build_reduce_plan(ids, n)
    return FrozenPlan(
        g_sorted=bins.sorted_gauss, tstart=bins.tile_start,
        counts=bins.counts, vt_real=bins.vt_real, vt_first=bins.vt_first,
        vt_n=bins.vt_n, total=bins.total, n_dropped=bins.n_dropped,
        n_truncated=bins.n_truncated, reduce=reduce_plan,
    )


def _prepare(camera, means3d, cov3d, config, screen_tap, opacities=None,
             tile_lo: int = 0, tile_hi: int | None = None,
             force_dense: bool = False, payload=None, frozen=None,
             proj=None, rank=None):
    grid_x = (camera.width + TILE - 1) // TILE
    grid_y = (camera.height + TILE - 1) // TILE
    if proj is None:
        proj = project(
            means3d, cov3d, camera, screen_tap=screen_tap,
            opacities=opacities if config.tight_radius else None,
        )
    # the Pallas kernels consume the sorted stream directly; the XLA scan
    # blend and vmapped group renders need the dense [T, K] matrix
    use_stream = (config.use_pallas() and not force_dense
                  and config.pallas_input == "stream")
    carry = None
    if use_stream and payload is not None:
        # the blend rows are delivered in sorted-slot order by ONE post-sort
        # row gather from this [N, D] table (see bin_gaussians' `carry`
        # docstring for the measured A/B vs riding the sort as operands).
        # stop_gradient: the custom VJP computes these cotangents itself by
        # per-splat reduction.
        opac_m = jnp.where(proj.valid, opacities, 0.0)
        carry = jax.lax.stop_gradient(jnp.concatenate(
            [proj.mean2d, proj.conic, opac_m[:, None], payload,
             proj.depth[:, None]], axis=-1,
        ))
    if frozen is not None:
        assert use_stream and carry is not None, (
            "frozen plans apply only to the Pallas stream path")
        sorted_carry = jax.lax.optimization_barrier(carry[frozen.g_sorted])
        bins = TileBins(
            gauss_idx=None, counts=frozen.counts, total=frozen.total,
            n_dropped=frozen.n_dropped, n_truncated=frozen.n_truncated,
            max_intersections=config.max_intersections(means3d.shape[0]),
            tile_start=frozen.tstart, sorted_gauss=frozen.g_sorted,
            sorted_carry=sorted_carry, vt_real=frozen.vt_real,
            vt_first=frozen.vt_first, vt_n=frozen.vt_n,
        )
    else:
        bins = bin_gaussians(
            proj,
            grid_x,
            grid_y,
            config.max_intersections(means3d.shape[0]),
            config.max_per_tile,
            tile_lo=tile_lo,
            tile_hi=tile_hi,
            dense=not use_stream,
            stream=use_stream,
            carry=carry,
            window_depth=config.tile_windows if use_stream else 0,
            window_extra=config.window_extra,
            rank=rank,
        )
    lo = tile_lo
    hi = grid_x * grid_y if tile_hi is None else tile_hi
    return proj, bins, _tile_pixels(grid_x, grid_y)[lo:hi], (grid_x, grid_y)


def _untile(x, grid_x, grid_y, H, W):
    ch = x.shape[-1]
    x = x.reshape(grid_y, grid_x, TILE, TILE, ch)
    x = x.transpose(0, 2, 1, 3, 4).reshape(grid_y * TILE, grid_x * TILE, ch)
    return x[:H, :W]


def _fold_windows(accum, t_final, vt_first, vt_n, S: int):
    """Composite each real tile's virtual-window sequence front-to-back:
    (a, T) o (a', T') = (a + T a', T T'). accum [Tv, NPIX, C], t_final
    [Tv, NPIX] from the kernels (each window blended from T=1) ->
    ([band, NPIX, C], [band, NPIX]). Plain differentiable gathers — the
    kernels' custom VJP receives per-WINDOW cotangents through autodiff of
    this fold, so the backward needs no window awareness."""
    Tv = accum.shape[0]
    acc = accum[vt_first]
    t = t_final[vt_first]
    for s in range(1, S):
        idx = jnp.minimum(vt_first + s, Tv - 1)
        live = (s < vt_n)[:, None]
        a2 = accum[idx]
        t2 = t_final[idx]
        acc = acc + jnp.where(live[..., None], t[..., None] * a2, 0.0)
        t = jnp.where(live, t * t2, t)
    return acc, t


def _composite(camera, proj, bins, pix, grids, opacities, payload, bg, config,
               tile_lo: int = 0, reduce_plan=None):
    grid_x, grid_y = grids
    H, W = camera.height, camera.width
    opac = jnp.where(proj.valid, opacities, 0.0)
    full_payload = jnp.concatenate([payload, proj.depth[:, None]], axis=-1)
    if config.use_pallas() and bins.sorted_gauss is not None:
        from opengaussian_tpu.ops.rasterize_pallas import (
            blend_tiles_pallas_stream,
        )

        n = proj.mean2d.shape[0]
        n_band = bins.counts.shape[0]  # virtual tiles under windowing
        max_chunks = config.max_intersections(n) // config.chunk + n_band
        toff = (tile_lo + bins.vt_real if bins.vt_real is not None
                else tile_lo + jnp.arange(n_band, dtype=jnp.int32))
        accum, t_final = blend_tiles_pallas_stream(
            proj.mean2d,
            proj.conic,
            opac,
            full_payload,
            bins.sorted_carry,
            bins.sorted_gauss,
            bins.tile_start,
            bins.counts,
            toff.astype(jnp.int32),
            reduce_plan,
            config.chunk,
            grid_x,
            max_chunks,
            config.max_per_tile,
            config.reduce_backend,
            config.bwd_layout,
        )
        if bins.vt_real is not None:
            accum, t_final = _fold_windows(
                accum, t_final, bins.vt_first, bins.vt_n, config.tile_windows
            )
    elif config.use_pallas():
        from opengaussian_tpu.ops.rasterize_pallas import blend_tiles_pallas

        n = proj.mean2d.shape[0]
        n_band = bins.counts.shape[0]
        max_chunks = config.max_intersections(n) // config.chunk + n_band
        accum, t_final = blend_tiles_pallas(
            proj.mean2d,
            proj.conic,
            opac,
            full_payload,
            bins.gauss_idx,
            bins.counts,
            jnp.asarray([tile_lo], jnp.int32),
            config.chunk,
            grid_x,
            max_chunks,
        )
    else:
        accum, t_final = _blend_tiles(
            proj.mean2d,
            proj.conic,
            opac,
            full_payload,
            bins.gauss_idx,
            bins.counts,
            pix,
            config.chunk,
        )
    C = payload.shape[1]
    img_tiles = accum[:, :, :C] + t_final[..., None] * bg[None, None, :]
    rows = accum.shape[0] // grid_x  # tile rows in this band (post-fold)
    y0 = (tile_lo // grid_x) * TILE
    hband = min(rows * TILE, H - y0)
    image = _untile(img_tiles, grid_x, rows, hband, W)
    alpha = _untile((1.0 - t_final)[..., None], grid_x, rows, hband, W)[..., 0]
    depth = _untile(accum[:, :, C:], grid_x, rows, hband, W)[..., 0]
    return image, alpha, depth


def rasterize(
    camera: Camera,
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacities: jnp.ndarray,
    payload: jnp.ndarray,
    bg: jnp.ndarray,
    config: RasterizeConfig = RasterizeConfig(),
    screen_tap: jnp.ndarray | None = None,
    frozen: FrozenPlan | None = None,
    proj: Projected | None = None,
    rank: jnp.ndarray | None = None,
) -> RasterOut:
    """Render an arbitrary per-splat payload [N, C] to an [H, W, C] image.

    Matches the reference rasterizer's output contract (image, radii, depth,
    alpha — SURVEY.md §2.1) but with C channels in one pass. `frozen`: a
    per-view FrozenPlan built by build_frozen_plan under the same camera /
    geometry / config — skips the whole binning chain (see FrozenPlan).
    `proj`/`rank`: a precomputed projection / depth rank (group renders
    hoist both out of their per-group scan — rasterize_scan_groups).
    """
    proj, bins, pix, grids = _prepare(
        camera, means3d, cov3d, config, screen_tap, opacities,
        payload=payload, frozen=frozen, proj=proj, rank=rank,
    )
    image, alpha, depth = _composite(
        camera, proj, bins, pix, grids, opacities, payload, bg, config,
        reduce_plan=frozen.reduce if frozen is not None else None,
    )
    return RasterOut(
        image=image,
        alpha=alpha,
        depth=depth,
        radii=proj.radius,
        n_dropped=bins.n_dropped,
        n_truncated=bins.n_truncated,
    )


def rasterize_banded(
    camera: Camera,
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacities: jnp.ndarray,
    payload: jnp.ndarray,
    bg: jnp.ndarray,
    config: RasterizeConfig = RasterizeConfig(),
    bands: int = 4,
    screen_tap: jnp.ndarray | None = None,
) -> RasterOut:
    """Render in `bands` horizontal tile bands to bound the dense per-tile
    memory (the [tiles, K, F] staging buffers scale with the tile count,
    which OOMs a single chip for 4K frames with millions of splats). Each
    band re-bins the frame (per-slot stream cost repeats) but only the
    band's tiles are staged densely. Pixel-exact: band results equal the
    single-pass render."""
    grid_x = (camera.width + TILE - 1) // TILE
    grid_y = (camera.height + TILE - 1) // TILE
    rows_per = (grid_y + bands - 1) // bands
    imgs, alphas, depths = [], [], []
    proj = bins = None
    n_dropped = jnp.int32(0)
    n_truncated = jnp.int32(0)
    bands_run = 0
    for b in range(bands):
        r0 = b * rows_per
        if r0 >= grid_y:
            break
        bands_run += 1
        r1 = min(grid_y, r0 + rows_per)
        proj, bins, pix, grids = _prepare(
            camera, means3d, cov3d, config, screen_tap, opacities,
            tile_lo=r0 * grid_x, tile_hi=r1 * grid_x, payload=payload,
        )
        image, alpha, depth = _composite(
            camera, proj, bins, pix, grids, opacities, payload, bg, config,
            tile_lo=r0 * grid_x,
        )
        imgs.append(image)
        alphas.append(alpha)
        depths.append(depth)
        n_dropped = n_dropped + bins.n_dropped
        n_truncated = n_truncated + bins.n_truncated
    return RasterOut(
        image=jnp.concatenate(imgs, axis=0),
        alpha=jnp.concatenate(alphas, axis=0),
        depth=jnp.concatenate(depths, axis=0),
        radii=proj.radius,
        n_dropped=n_dropped // bands_run,  # every band sees the same full stream
        n_truncated=n_truncated,
    )


def rasterize_scan_groups(
    camera: Camera,
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacities: jnp.ndarray,  # [G, N] per-group masked opacities
    payload: jnp.ndarray,
    bg: jnp.ndarray,
    config: RasterizeConfig = RasterizeConfig(),
) -> RasterOut:
    """Render G subsets as a lax.scan of single-group rasterizes.

    The r5 group-render design (VERDICT r4 item 1): each group re-bins with
    ITS OWN masked opacities, so the opacity-aware tight-radius cull assigns
    radius 0 to every non-member and the per-group sorted stream holds only
    that group's splats. Consequences vs the vmapped-dense `rasterize_groups`:

      * the production Pallas STREAM kernels apply (manual in-kernel DMAs do
        not batch under vmap, which forced the dense [T, K, F] twin before);
      * each group's blend walks ~its own share of the scene, so the total
        blend work over a disjoint partition is ~ONE full-scene pass instead
        of G full union walks (measured 64-group sweep-2 view: 4.8 s dense
        vs 0.15 s scan on v5e at the recipe shape — tools/stage_bench.py);
      * per-group budgets (config.group_intersection_budget /
        group_max_per_tile, sized by ops/budget.tuned_group_config) shrink
        every per-slot binning phase by ~G vs the frame budget;
      * gradients flow exactly as in a plain rasterize (full custom-VJP
        support — stage 2.2 trains through this path).

    Exact by the same argument as the dense twin: a zero-opacity splat
    contributes no alpha, so masking == subsetting; per-group radii equal
    the union render's radii wherever the splat belongs to any group (its
    real opacity), so `max` over the group axis reproduces them.
    Requires tight_radius for the stream-shrinking effect (correct either
    way). Returns RasterOut with a leading group axis on image/alpha/depth.

    Projection + depth rank are HOISTED out of the scan: for a group
    MEMBER the masked opacity equals its real opacity, so the union
    projection's radius/rect/conic are bit-identical to what a per-group
    project() would compute; non-members just zero radius/num_tiles/valid.
    That removes one full [N] projection + one [N] argsort per group
    (~2 ms each at 200k splats — repeated k1*k2=320 times per lang-sweep
    view before the hoist, tools/stage_bench.py).
    """
    gcfg = config.group_config()
    union_opac = jnp.max(opacities, axis=0)
    proj_u: Projected = project(
        means3d, cov3d, camera,
        opacities=union_opac if config.tight_radius else None,
    )
    rank = depth_rank(jax.lax.stop_gradient(proj_u.depth))

    def one(opac_g):
        m = opac_g > 0.0
        proj_g = dataclasses.replace(
            proj_u,
            radius=jnp.where(m, proj_u.radius, 0),
            cull_radius=jnp.where(m, proj_u.cull_radius, 0.0),
            num_tiles=jnp.where(m, proj_u.num_tiles, 0),
            valid=proj_u.valid & m,
        )
        r = rasterize(camera, means3d, cov3d, opac_g, payload, bg, gcfg,
                      proj=proj_g, rank=rank)
        return (r.image, r.alpha, r.depth, r.radii, r.n_dropped, r.n_truncated)

    if opacities.shape[0] == 1:
        img, alpha, depth, radii, nd, nt = jax.tree.map(
            lambda x: x[None], one(opacities[0])
        )
        radii, nd, nt = radii[0], nd[0], nt[0]
    else:
        _, (img, alpha, depth, radii, nd, nt) = jax.lax.scan(
            lambda c, o: (c, one(o)), None, opacities
        )
        radii = jnp.max(radii, axis=0)
        nd, nt = jnp.sum(nd), jnp.sum(nt)
    return RasterOut(
        image=img, alpha=alpha, depth=depth, radii=radii,
        n_dropped=nd, n_truncated=nt,
    )


def rasterize_partition(
    camera: Camera,
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacities: jnp.ndarray,  # [N] UNION-masked (0 for splats in no group)
    group_of: jnp.ndarray,  # [N] int32 group index 0..G-1
    num_groups: int,
    payload: jnp.ndarray,
    bg: jnp.ndarray,
    config: RasterizeConfig = RasterizeConfig(),
    proj: Projected | None = None,
    rank: jnp.ndarray | None = None,
) -> RasterOut:
    """Render G DISJOINT groups (a cluster partition) in ONE pass.

    Partition binning (bin_gaussians group_of): every slot's sort key is
    offset by group_of * num_tiles, so one expansion + one sort + one
    searchsorted + ONE stream-kernel launch cover all G groups — where
    rasterize_scan_groups pays ~4.6 ms of fixed per-render latency
    (searchsorted probes, grid launch, assembly fusions) per group at the
    ScanNet recipe shape (tools/stage_bench.py lang probe: the k1*k2=320
    per-leaf renders were 1472 ms of a 1505 ms lang view). Total slot work
    equals ONE pass over the partition's splats, like the scan mode.

    Exactness: groups are disjoint, so each virtual tile's depth-sorted run
    holds exactly the slots a single-group binning would produce — same
    blend semantics, same budgets meaning (P spans the PARTITION's total
    intersections; max_per_tile bounds each (group, tile) run). Use
    config.group_config()-style budgets sized for the partition.

    Returns RasterOut with a leading group axis on image/alpha/depth;
    radii are the union's (tight radius of each splat under its own
    opacity). Stream/Pallas path only."""
    assert config.use_pallas() and config.pallas_input == "stream", (
        "rasterize_partition requires the Pallas stream path")
    grid_x = (camera.width + TILE - 1) // TILE
    grid_y = (camera.height + TILE - 1) // TILE
    T = grid_x * grid_y
    n = means3d.shape[0]
    if proj is None:
        proj = project(
            means3d, cov3d, camera,
            opacities=opacities if config.tight_radius else None,
        )
    opac = jnp.where(proj.valid, opacities, 0.0)
    full_payload = jnp.concatenate([payload, proj.depth[:, None]], axis=-1)
    carry = jax.lax.stop_gradient(jnp.concatenate(
        [proj.mean2d, proj.conic, opac[:, None], full_payload[:, :-1],
         proj.depth[:, None]], axis=-1,
    ))
    bins = bin_gaussians(
        proj, grid_x, grid_y, config.max_intersections(n),
        config.max_per_tile, dense=False, stream=True, carry=carry,
        window_depth=config.tile_windows, window_extra=config.window_extra,
        rank=rank, group_of=group_of, num_groups=num_groups,
    )
    from opengaussian_tpu.ops.rasterize_pallas import (
        blend_tiles_pallas_stream,
    )

    n_band = bins.counts.shape[0]  # G*T, or virtual windows thereof
    max_chunks = config.max_intersections(n) // config.chunk + n_band
    vt = (bins.vt_real if bins.vt_real is not None
          else jnp.arange(n_band, dtype=jnp.int32))
    toff = vt % T  # REAL tile index for the kernel's pixel coords
    accum, t_final = blend_tiles_pallas_stream(
        proj.mean2d, proj.conic, opac, full_payload, bins.sorted_carry,
        bins.sorted_gauss, bins.tile_start, bins.counts,
        toff.astype(jnp.int32), None, config.chunk, grid_x, max_chunks,
        config.max_per_tile, config.reduce_backend, config.bwd_layout,
    )
    if bins.vt_real is not None:
        accum, t_final = _fold_windows(
            accum, t_final, bins.vt_first, bins.vt_n, config.tile_windows
        )
    C = payload.shape[1]
    H, W = camera.height, camera.width
    img_tiles = accum[:, :, :C] + t_final[..., None] * bg[None, None, :]

    def _untile_g(x):
        ch = x.shape[-1]
        x = x.reshape(num_groups, grid_y, grid_x, TILE, TILE, ch)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            num_groups, grid_y * TILE, grid_x * TILE, ch)
        return x[:, :H, :W]

    image = _untile_g(img_tiles)
    alpha = _untile_g((1.0 - t_final)[..., None])[..., 0]
    depth = _untile_g(accum[:, :, C:])[..., 0]
    return RasterOut(
        image=image, alpha=alpha, depth=depth, radii=proj.radius,
        n_dropped=bins.n_dropped, n_truncated=bins.n_truncated,
    )


def rasterize_groups(
    camera: Camera,
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacities: jnp.ndarray,  # [G, N] per-group masked opacities
    payload: jnp.ndarray,
    bg: jnp.ndarray,
    config: RasterizeConfig = RasterizeConfig(),
) -> RasterOut:
    """Render G subsets of the same scene (e.g. per-cluster renders).

    Round-1 design, kept as the `group_render="dense"` fallback (see
    `rasterize_scan_groups` for the default): projection, covariance, and
    tile binning/sorting run ONCE over the union; only the blend is vmapped
    over per-group opacity masks. A splat with zero opacity does not alter
    transmittance, so masked blending over the superset list is exactly
    equivalent to rasterizing each subset — but every group pays a full
    union-stream walk and the dense [T, K, F] staging.

    Returns RasterOut with leading group axis on image/alpha/depth.
    """
    # force the dense [T, K] layout: group renders vmap the blend over
    # per-group opacities, and vmapping the stream kernel's manual DMAs is
    # not supported — the dense BlockSpec path batches fine
    proj, bins, pix, grids = _prepare(
        camera, means3d, cov3d, config, None, jnp.max(opacities, axis=0),
        force_dense=True,
    )
    comp = jax.vmap(
        lambda op: _composite(camera, proj, bins, pix, grids, op, payload, bg, config)
    )
    image, alpha, depth = comp(opacities)
    return RasterOut(
        image=image,
        alpha=alpha,
        depth=depth,
        radii=proj.radius,
        n_dropped=bins.n_dropped,
        n_truncated=bins.n_truncated,
    )
