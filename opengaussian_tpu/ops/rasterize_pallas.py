"""Fused Pallas TPU blend kernels (forward + backward).

Drop-in replacement for the XLA lax.scan blend in ops/rasterize.py. Same
semantics (ops/blend.py: alpha clamp at 0.99, 1/255 skip, permanent early
stop below T=1e-4), restructured for the TPU memory hierarchy:

  * grid = (tiles/GROUP,): each grid step owns GROUP 16x16 tiles
    (statically unrolled) and loops over each tile's depth-ordered splat
    chunks with `lax.while_loop` INSIDE the kernel — the running
    transmittance, early-stop flag, and C-channel accumulator are
    loop-carried values that never leave registers/VMEM. A tile whose
    pixels all saturate exits the loop early, and a tile with few splats
    loops only ceil(count/chunk) times. The fixed per-grid-step cost is
    ~1.3 us on v5e; GROUP tiles per step amortize it while keeping
    intermediates at [chunk, NPIX] VPU size.
  * per-(splat,pixel) alpha math is VPU work on [chunk, 256] blocks; the
    sequential-compositing cumulative product is computed EXACTLY with
    log2(chunk) shift-doubling multiplies (no transcendental log/exp) and
    compositing is one [C, chunk] x [chunk, 256] MXU contraction per chunk;
  * the backward kernel replays the forward (storing only final T and the
    premultiplied accumulation, like the reference CUDA backward) and emits
    per-slot gradients either in the dense [T, K] layout (BWD_LAYOUT=
    "dense": BlockSpec blocks + an XLA chunk-compaction gather) or DMA'd
    straight to compacted chunk offsets ("compact",
    `blend_stream_pallas_bwd_compact`: no dense buffer, no gather); the
    rows are then reduced per splat — via segment_sum (REDUCE_BACKEND=
    "scatter") or sort + windowed one-hot MXU contraction ("sorted_mxu",
    `sorted_segment_reduce`). tools/ab_reduce.py A/Bs the reductions on
    chip.

TWO input layouts exist:

  * STREAM (`blend_tiles_pallas_stream`, the production path): the kernels
    DMA each tile's contiguous run straight out of the (tile, depth)-sorted
    slot stream at scalar-prefetched offsets, double-buffered one grid step
    ahead. The per-slot rows [Ppad, LANES] arrive from binning's sort-carry
    (bin_gaussians(carry=...)) — no dense [T, K] matrix, no dense scatter,
    no random row gather (those measured ~16 ms/step combined at the bench
    workload). The splat id rides as an f32 column, written through to the
    gradient rows so the per-splat reduction needs no separate id plumbing.
  * DENSE (`blend_tiles_pallas`): [T, K, F] BlockSpec staging, kept for
    vmapped group renders (cluster passes) — manual in-kernel DMAs do not
    batch under vmap.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opengaussian_tpu.ops import blend
from opengaussian_tpu.ops.projection import TILE

NPIX = TILE * TILE  # 256 pixels per tile


# Sort gradient rows by splat id before the per-splat scatter-add. A/B on
# chip measured it a wash (66.35 vs 65.90 ms/step at the heavy bench
# workload): the sorted-indices hint does not speed XLA's scatter-add enough
# to pay for the extra sort + restack. Kept as a switch for future XLA
# versions.
SORTED_REDUCE = False

# Exclusive cumprod via MXU log-space matmul: measured ~neutral on the step
# time AND the exp/log round trip near the T_EPS/ALPHA_MIN thresholds costs
# 3 orders of magnitude of pallas-vs-XLA parity (2e-3 vs 1e-6 image error on
# chip, threshold flips) — keep the exact shift-doubling product.
LOG_CUMPROD = False


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _roll(x, s, axis=0):
    if _use_interpret():
        return jnp.roll(x, s, axis=axis)
    return pltpu.roll(x, s, axis=axis)


def _cumulative(x, op, shifts_axis=0):
    """Inclusive cumulative op along axis 0 via shift-doubling (exact same
    tree order as jnp.cum* on TPU up to reassociation; 6 steps for 64)."""
    k = x.shape[shifts_axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, shifts_axis)
    s = 1
    while s < k:
        shifted = _roll(x, s, axis=shifts_axis)
        x = jnp.where(idx >= s, op(x, shifted), x)
        s *= 2
    return x


def _pixels(t, grid_x):
    """[1, NPIX] pixel x/y coordinates for tile t (pixf = integer index)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, NPIX), 1)
    px = (t % grid_x) * TILE + lane % TILE
    py = (t // grid_x) * TILE + lane // TILE
    return px.astype(jnp.float32), py.astype(jnp.float32)


def _chunk_blend_math(g, cnt, c, chunk, px, py, tvec, done):
    """Shared forward math for one chunk. Returns per-chunk tensors.

    tvec/done are [1, NPIX] loop-carried values (running transmittance and
    permanent early-stop flag).

    Early-stop bookkeeping exploits two invariants of the blend semantics
    (ops/blend.py): (a) the incoming transmittance is always >= T_EPS — the
    frozen value is T *before* the first crossing, which by definition of a
    first crossing is >= T_EPS — and (b) t_seq is monotone non-increasing
    within the chunk. Hence "a crossing happened at or before slot k" is
    exactly `t_seq_k < T_EPS`, which kills the cumulative-sum / one-hot
    first-failure machinery of the naive formulation (~25 VPU ops per chunk):

      * contrib_k = active_k & (t_seq_k >= eps) & ~done — a slot composites
        iff no crossing at or before it (fail_before_k ⇒ t_prev_k <= the
        crossing's t_seq < eps ⇒ t_seq_k < eps; fail_k ⇒ t_seq_k < eps; and
        conversely an active slot with t_seq_k < eps is fail or fail_before);
      * the new T = min over live slots of t_seq (monotonicity makes the
        product over pre-crossing factors equal the last live t_seq), with
        t_in as the empty-reduction default (crossing at slot 0);
      * a crossing occurred in this chunk ⟺ t_seq[-1] < eps (monotonicity +
        t_in >= eps).
    """
    mean_x = g[:, 0:1]
    mean_y = g[:, 1:2]
    ca = g[:, 2:3]
    cb = g[:, 3:4]
    cc = g[:, 4:5]
    opac = g[:, 5:6]
    dx = mean_x - px  # [Kc, NPIX]
    dy = mean_y - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    gauss = jnp.exp(jnp.minimum(power, 0.0))
    araw = jnp.where(power <= 0.0, opac * gauss, 0.0)
    kidx = jax.lax.broadcasted_iota(jnp.int32, araw.shape, 0)
    kmask = (c * chunk + kidx) < cnt
    a = jnp.minimum(araw, blend.ALPHA_MAX)
    a = jnp.where((a >= blend.ALPHA_MIN) & kmask, a, 0.0)

    factors = 1.0 - a
    if LOG_CUMPROD:
        # exclusive cumprod as one strictly-lower-triangular MXU contraction
        # in log space: factors >= 1 - ALPHA_MAX = 0.01 so log is safe, and
        # the exp/log round trip (~1e-6 rel) is far inside the grad parity
        # bar. Saves ~15 VPU ops vs the shift-doubling product.
        kc = factors.shape[0]
        tri = jnp.tril(jnp.ones((kc, kc), jnp.float32), -1)
        excl = jnp.exp(jax.lax.dot_general(
            tri, jnp.log(factors), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # bf16 passes break parity
        ))
    else:
        cum = _cumulative(factors, jnp.multiply)  # inclusive cumprod
        excl = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, cum.shape, 0) == 0,
            1.0,
            _roll(cum, 1, axis=0),
        )
    t_prev = tvec * excl
    t_seq = t_prev * factors
    live = t_seq >= blend.T_EPS  # no crossing at or before this slot
    # the done carry is folded in multiplicatively (done is exactly 0/1):
    # boolean ops against the [1, NPIX] carry hit an unimplemented Mosaic
    # sublane broadcast, mul broadcasts are supported
    contrib = (a > 0.0) & live
    not_done = 1.0 - done
    w = jnp.where(contrib, a * t_prev, 0.0) * not_done

    # Non-live slots use a 2.0 sentinel (> any transmittance) so the reduce
    # ignores them; clamping with tvec afterwards handles the all-non-live
    # case. (Folding tvec into the selected values instead needs a Mosaic
    # sublane broadcast of the [1, NPIX] carry, which is unimplemented.)
    t_next = jnp.minimum(
        jnp.min(jnp.where(live, t_seq, 2.0), axis=0, keepdims=True), tvec
    )
    new_t = jnp.where(done > 0.0, tvec, t_next)
    # crossing in this chunk <=> min(t_seq) < eps (monotone, so min == last;
    # a [-1:] slice here trips a Mosaic compiler crash, the reduce is fine)
    any_fail = (
        jnp.min(t_seq, axis=0, keepdims=True) < blend.T_EPS
    ).astype(jnp.float32)
    new_done = jnp.maximum(done, any_fail)
    return dict(
        a=a, araw=araw, gauss=gauss, w=w, t_prev=t_prev, contrib=contrib,
        not_done=not_done, dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, opac=opac,
        new_t=new_t, new_done=new_done,
    )


def _nchunks(cnt, chunk):
    return (cnt + chunk - 1) // chunk


def _chunk_grad_rows(g, m, gacc, g_t, t_final, ga_total, bacc, C):
    """Shared backward math for one chunk: replay residuals `m` (from
    _chunk_blend_math) against the incoming cotangents -> per-slot gradient
    rows [Kc, 6+C] (dmean2d, dconic, dopac, dpayload) and the inclusive
    suffix accumulator b_inc (whose last row is the next chunk's bacc)."""
    pay = g[:, 6:6 + C]
    # gc[k,p] = sum_c g_accum[c,p] * payload[k,c]
    gc = jax.lax.dot_general(
        pay, gacc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Kc, NPIX]
    u = m["w"] * gc
    # exact shift-doubling cumsum: an MXU triangular matmul needs
    # Precision.HIGHEST for parity (default bf16 passes lose 3 digits)
    # and the 6-pass f32 emulation measures ~10 ms/step SLOWER
    b_inc = bacc + _cumulative(u, jnp.add)
    one_m_a = jnp.maximum(1.0 - m["a"], 1.0 - blend.ALPHA_MAX)
    d_alpha = jnp.where(
        m["contrib"],
        m["t_prev"] * gc
        - (ga_total - b_inc) / one_m_a
        - (g_t * t_final) / one_m_a,
        0.0,
    ) * m["not_done"]  # early-stopped pixels contribute no gradient
    # alpha saturation: min(0.99, .) kills the gradient when clamped
    not_clamped = (m["araw"] < blend.ALPHA_MAX).astype(jnp.float32)
    d_alpha = d_alpha * not_clamped

    d_power = m["a"] * d_alpha
    dx, dy = m["dx"], m["dy"]
    ca, cb, cc = m["ca"], m["cb"], m["cc"]
    d_mx = jnp.sum(d_power * -(ca * dx + cb * dy), axis=1, keepdims=True)
    d_my = jnp.sum(d_power * -(cc * dy + cb * dx), axis=1, keepdims=True)
    d_ca = jnp.sum(d_power * (-0.5 * dx * dx), axis=1, keepdims=True)
    d_cb = jnp.sum(d_power * (-dx * dy), axis=1, keepdims=True)
    d_cc = jnp.sum(d_power * (-0.5 * dy * dy), axis=1, keepdims=True)
    d_o = jnp.sum(d_alpha * m["gauss"], axis=1, keepdims=True)
    d_pay = jax.lax.dot_general(
        m["w"], gacc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Kc, C]
    rows = jnp.concatenate(
        [d_mx, d_my, d_ca, d_cb, d_cc, d_o, d_pay], axis=1
    )
    return rows, b_inc


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


GROUP = 4  # tiles per grid step — amortizes the fixed per-grid-step cost
# (measured ~1.3 us/step on v5e: ~6 ms of pure overhead at ~5k tiles)
# while keeping every intermediate at [chunk, NPIX] VPU size.


def _fwd_kernel(counts_ref, toff_ref, gdata_ref, acc_out, t_out, *, chunk,
                grid_x, C, n_tiles):
    base = pl.program_id(0) * GROUP
    for gi in range(GROUP):  # static unroll over the tile group
        t = base + gi
        live = t < n_tiles  # boundary block: reads clamped, writes dropped
        cnt = jnp.where(live, counts_ref[jnp.minimum(t, n_tiles - 1)], 0)
        nc = _nchunks(cnt, chunk)
        px, py = _pixels(t + toff_ref[0], grid_x)

        def cond(carry):
            c, _, _, done = carry
            return (c < nc) & (jnp.min(done) < 0.5)

        def body(carry):
            c, acc, tvec, done = carry
            g = gdata_ref[gi, pl.ds(c * chunk, chunk), :]  # [Kc, F] VMEM slice
            m = _chunk_blend_math(g, cnt, c, chunk, px, py, tvec, done)
            pay = g[:, 6:]  # [Kc, C]
            acc = acc + jax.lax.dot_general(
                pay, m["w"], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [C, NPIX]
            return (c + 1, acc, m["new_t"], m["new_done"])

        carry0 = (
            jnp.int32(0),
            jnp.zeros((C, NPIX), jnp.float32),
            jnp.ones((1, NPIX), jnp.float32),
            jnp.zeros((1, NPIX), jnp.float32),
        )
        _, acc, tvec, _ = jax.lax.while_loop(cond, body, carry0)
        acc_out[gi] = acc
        t_out[gi] = tvec


def blend_tiles_pallas_fwd(gdata, counts, grid_x: int, chunk: int,
                           tile_offset=None):
    """gdata [T, K, F] (F = 6 + C), counts [T] -> (accum [T, C, NPIX],
    t_final [T, NPIX]). tile_offset shifts the global tile id of row 0 —
    used by the tile-sharded multi-chip path, where each device owns a
    contiguous tile range."""
    T, K, F = gdata.shape
    C = F - 6
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    kern = functools.partial(_fwd_kernel, chunk=chunk, grid_x=grid_x, C=C,
                             n_tiles=T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=((T + GROUP - 1) // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, K, F), lambda t, counts, toff: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((GROUP, C, NPIX), lambda t, counts, toff: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 1, NPIX), lambda t, counts, toff: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    acc, t_final = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((T, C, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, NPIX), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts, tile_offset, gdata)
    return acc, t_final[:, 0, :]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(counts_ref, toff_ref, gdata_ref, gacc_ref, gt_ref, tfin_ref,
                gatot_ref, dslot_out, *, chunk, grid_x, C, n_tiles):
    base = pl.program_id(0) * GROUP
    dslot_out[...] = jnp.zeros(dslot_out.shape, dslot_out.dtype)
    for gi in range(GROUP):  # static unroll over the tile group
        _bwd_tile(counts_ref, toff_ref, gdata_ref, gacc_ref, gt_ref, tfin_ref,
                  gatot_ref, dslot_out, base + gi, gi, chunk, grid_x, n_tiles)


def _bwd_tile(counts_ref, toff_ref, gdata_ref, gacc_ref, gt_ref, tfin_ref,
              gatot_ref, dslot_out, t, gi, chunk, grid_x, n_tiles):
    live = t < n_tiles
    cnt = jnp.where(live, counts_ref[jnp.minimum(t, n_tiles - 1)], 0)
    nc = _nchunks(cnt, chunk)
    px, py = _pixels(t + toff_ref[0], grid_x)

    gacc = gacc_ref[gi]  # [C, NPIX]
    g_t = gt_ref[gi, 0:1, :]  # [1, NPIX]
    t_final = tfin_ref[gi, 0:1, :]
    ga_total = gatot_ref[gi, 0:1, :]

    def cond(carry):
        c, _, _, _ = carry
        return (c < nc) & (jnp.min(carry[3]) < 0.5)

    def body(carry):
        c, bacc, tvec, done = carry
        g = gdata_ref[gi, pl.ds(c * chunk, chunk), :]  # [Kc, F]
        m = _chunk_blend_math(g, cnt, c, chunk, px, py, tvec, done)
        rows, b_inc = _chunk_grad_rows(
            g, m, gacc, g_t, t_final, ga_total, bacc, gacc.shape[0]
        )
        dslot_out[gi, pl.ds(c * chunk, chunk), :] = rows
        bacc = b_inc[-1:, :]  # == bacc + sum(u): the cumsum's last row
        return (c + 1, bacc, m["new_t"], m["new_done"])

    carry0 = (
        jnp.int32(0),
        jnp.zeros((1, NPIX), jnp.float32),
        jnp.ones((1, NPIX), jnp.float32),
        jnp.zeros((1, NPIX), jnp.float32),
    )
    jax.lax.while_loop(cond, body, carry0)


def blend_tiles_pallas_bwd(gdata, counts, accum, t_final, g_accum, g_t,
                           grid_x: int, chunk: int, tile_offset=None):
    """-> d_slot [T, K, F] (layout: dmean2d(2), dconic(3), dopac(1),
    dpayload(C)) — per-slot gradients, to be segment-summed by splat id."""
    T, K, F = gdata.shape
    C = F - 6
    if tile_offset is None:
        tile_offset = jnp.zeros((1,), jnp.int32)
    ga_total = jnp.sum(g_accum * accum, axis=1)  # [T, NPIX]
    kern = functools.partial(_bwd_kernel, chunk=chunk, grid_x=grid_x, C=C,
                             n_tiles=T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=((T + GROUP - 1) // GROUP,),
        in_specs=[
            pl.BlockSpec((GROUP, K, F), lambda t, counts, toff: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, C, NPIX), lambda t, counts, toff: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 1, NPIX), lambda t, counts, toff: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 1, NPIX), lambda t, counts, toff: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, 1, NPIX), lambda t, counts, toff: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((GROUP, K, F), lambda t, counts, toff: (t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, K, F), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts, tile_offset, gdata, g_accum, g_t[:, None, :], t_final[:, None, :],
      ga_total[:, None, :])


# ---------------------------------------------------------------------------
# stream-input kernels: each tile's depth run is DMA'd straight out of the
# (tile, depth)-sorted slot stream — there is no dense [T, K] index matrix,
# no [T, K, F] XLA row-gather, and no dense scatter in binning (the three
# together measured ~16 ms/step at the bench workload on v5e). The rows for
# grid step s+1's tiles are prefetched into the other half of a
# double-buffered VMEM scratch while step s computes, so the HBM reads ride
# the same pipeline the BlockSpec path used.
# ---------------------------------------------------------------------------


# Mosaic DMA slices need the minor dim to be a 128-lane multiple (dynamic
# ROW offsets are unrestricted — probed on v5e), so stream rows are padded
# to LANES floats. The kernels only touch columns [0, 6+C).
LANES = 128

# Scoped-VMEM budget for the stream kernels' double-buffered [2, group, K,
# LANES] scratch. The TPU scoped-vmem limit is 16 MB; at GROUP=4 the scratch
# alone crosses it near K ~ 2000 (measured: stage-0 at 648x484 with a tuned
# K=2368 OOMs compile — "scoped allocation 18.54M > 16.00M"). Deep per-tile
# budgets therefore shrink the tile group instead of dying: fewer tiles per
# grid step costs only the ~1.3 us fixed step overhead times more steps
# (~1.6 ms worst case at 5k tiles), while K stays exact.
SCRATCH_CAP_BYTES = 8 * 1024 * 1024


def stream_group(K: int) -> int:
    g = GROUP
    while g > 1 and 2 * g * K * LANES * 4 > SCRATCH_CAP_BYTES:
        g //= 2
    return g


def _stream_issue(stream_ref, tstart_ref, scratch, sems, step, buf, K,
                  n_tiles, group):
    for gi in range(group):
        t = step * group + gi
        off = tstart_ref[jnp.minimum(t, n_tiles - 1)]
        pltpu.make_async_copy(
            stream_ref.at[pl.ds(off, K), :],
            scratch.at[buf, gi],
            sems.at[buf, gi],
        ).start()


def _stream_wait(stream_ref, tstart_ref, scratch, sems, step, buf, gi, K,
                 n_tiles, group):
    t = step * group + gi
    off = tstart_ref[jnp.minimum(t, n_tiles - 1)]
    pltpu.make_async_copy(
        stream_ref.at[pl.ds(off, K), :],
        scratch.at[buf, gi],
        sems.at[buf, gi],
    ).wait()


def _fwd_stream_kernel(counts_ref, tstart_ref, toff_ref, stream_ref, acc_out,
                       t_out, scratch, sems, *, chunk, grid_x, C, K, n_tiles,
                       group):
    s = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        _stream_issue(stream_ref, tstart_ref, scratch, sems, 0, 0, K, n_tiles,
                      group)

    @pl.when(s + 1 < nsteps)
    def _():
        _stream_issue(stream_ref, tstart_ref, scratch, sems, s + 1,
                      (s + 1) % 2, K, n_tiles, group)

    buf = s % 2
    for gi in range(group):  # static unroll over the tile group
        _stream_wait(stream_ref, tstart_ref, scratch, sems, s, buf, gi, K,
                     n_tiles, group)
        t = s * group + gi
        live = t < n_tiles
        cnt = jnp.where(live, counts_ref[jnp.minimum(t, n_tiles - 1)], 0)
        nc = _nchunks(cnt, chunk)
        # toff_ref: [n_tiles] ABSOLUTE tile id per (virtual) tile — under
        # tile windowing several consecutive kernel tiles map to one real
        # image tile, so pixel coords come from the table, not from
        # grid-index arithmetic
        px, py = _pixels(toff_ref[jnp.minimum(t, n_tiles - 1)], grid_x)

        def cond(carry):
            c, _, _, done = carry
            return (c < nc) & (jnp.min(done) < 0.5)

        def body(carry):
            c, acc, tvec, done = carry
            g = scratch[buf, gi, pl.ds(c * chunk, chunk), :]  # [Kc, LANES]
            m = _chunk_blend_math(g, cnt, c, chunk, px, py, tvec, done)
            pay = g[:, 6:6 + C]
            acc = acc + jax.lax.dot_general(
                pay, m["w"], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return (c + 1, acc, m["new_t"], m["new_done"])

        carry0 = (
            jnp.int32(0),
            jnp.zeros((C, NPIX), jnp.float32),
            jnp.ones((1, NPIX), jnp.float32),
            jnp.zeros((1, NPIX), jnp.float32),
        )
        _, acc, tvec, _ = jax.lax.while_loop(cond, body, carry0)
        acc_out[gi] = acc
        t_out[gi] = tvec


def blend_stream_pallas_fwd(rows, counts, tstart, grid_x: int, chunk: int,
                            K: int, n_fields: int, tile_offset=None):
    """rows [Ppad, LANES] sorted-stream splat rows (columns [0, n_fields) =
    mean2d(2) + conic(3) + opac(1) + payload(C) + splat_id(1), rest zero
    padding), counts [T], tstart [T] -> (accum [T, C, NPIX],
    t_final [T, NPIX])."""
    T = counts.shape[0]
    C = n_fields - 7
    if tile_offset is None:
        tile_offset = jnp.arange(T, dtype=jnp.int32)
    grp = stream_group(K)
    kern = functools.partial(_fwd_stream_kernel, chunk=chunk, grid_x=grid_x,
                             C=C, K=K, n_tiles=T, group=grp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=((T + grp - 1) // grp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((grp, C, NPIX), lambda t, c, ts, to: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grp, 1, NPIX), lambda t, c, ts, to: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, grp, K, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, grp)),
        ],
    )
    acc, t_final = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((T, C, NPIX), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, NPIX), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts, tstart, tile_offset, rows)
    return acc, t_final[:, 0, :]


def _bwd_stream_kernel(counts_ref, tstart_ref, toff_ref, stream_ref, gacc_ref,
                       gt_ref, tfin_ref, gatot_ref, dslot_out, scratch, sems,
                       *, chunk, grid_x, C, K, n_tiles, group):
    s = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        _stream_issue(stream_ref, tstart_ref, scratch, sems, 0, 0, K, n_tiles,
                      group)

    @pl.when(s + 1 < nsteps)
    def _():
        _stream_issue(stream_ref, tstart_ref, scratch, sems, s + 1,
                      (s + 1) % 2, K, n_tiles, group)

    dslot_out[...] = jnp.zeros(dslot_out.shape, dslot_out.dtype)
    buf = s % 2
    for gi in range(group):
        _stream_wait(stream_ref, tstart_ref, scratch, sems, s, buf, gi, K,
                     n_tiles, group)
        t = s * group + gi
        live = t < n_tiles
        cnt = jnp.where(live, counts_ref[jnp.minimum(t, n_tiles - 1)], 0)
        nc = _nchunks(cnt, chunk)
        # toff_ref: [n_tiles] ABSOLUTE tile id per (virtual) tile — under
        # tile windowing several consecutive kernel tiles map to one real
        # image tile, so pixel coords come from the table, not from
        # grid-index arithmetic
        px, py = _pixels(toff_ref[jnp.minimum(t, n_tiles - 1)], grid_x)

        gacc = gacc_ref[gi]  # [C, NPIX]
        g_t = gt_ref[gi, 0:1, :]
        t_final = tfin_ref[gi, 0:1, :]
        ga_total = gatot_ref[gi, 0:1, :]

        def cond(carry):
            c, _, _, done = carry
            return (c < nc) & (jnp.min(done) < 0.5)

        def body(carry):
            c, bacc, tvec, done = carry
            g = scratch[buf, gi, pl.ds(c * chunk, chunk), :]
            m = _chunk_blend_math(g, cnt, c, chunk, px, py, tvec, done)
            rows, b_inc = _chunk_grad_rows(
                g, m, gacc, g_t, t_final, ga_total, bacc, C
            )
            # last column: the splat id, passed through so the reduction
            # reads ids from the gradient rows themselves
            dslot_out[gi, pl.ds(c * chunk, chunk), :] = jnp.concatenate(
                [rows, g[:, 6 + C:7 + C]], axis=1
            )
            bacc = b_inc[-1:, :]
            return (c + 1, bacc, m["new_t"], m["new_done"])

        carry0 = (
            jnp.int32(0),
            jnp.zeros((1, NPIX), jnp.float32),
            jnp.ones((1, NPIX), jnp.float32),
            jnp.zeros((1, NPIX), jnp.float32),
        )
        jax.lax.while_loop(cond, body, carry0)


def blend_stream_pallas_bwd(rows, counts, tstart, accum, t_final, g_accum,
                            g_t, grid_x: int, chunk: int, K: int,
                            n_fields: int, tile_offset=None):
    """-> d_slot [T, K, n_fields] dense per-slot gradients + id column."""
    T = counts.shape[0]
    F = n_fields
    C = F - 7
    if tile_offset is None:
        tile_offset = jnp.arange(T, dtype=jnp.int32)
    ga_total = jnp.sum(g_accum * accum, axis=1)  # [T, NPIX]
    grp = stream_group(K)
    kern = functools.partial(_bwd_stream_kernel, chunk=chunk, grid_x=grid_x,
                             C=C, K=K, n_tiles=T, group=grp)
    bspec = lambda shape: pl.BlockSpec(shape, lambda t, c, ts, to: (t, 0, 0),
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=((T + grp - 1) // grp,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            bspec((grp, C, NPIX)),
            bspec((grp, 1, NPIX)),
            bspec((grp, 1, NPIX)),
            bspec((grp, 1, NPIX)),
        ],
        out_specs=pl.BlockSpec((grp, K, F), lambda t, c, ts, to: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, grp, K, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, grp)),
        ],
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, K, F), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts, tstart, tile_offset, rows, g_accum, g_t[:, None, :],
      t_final[:, None, :], ga_total[:, None, :])


# ---------------------------------------------------------------------------
# compact-output stream backward: instead of staging d_slot as dense
# [T, K, F] BlockSpec blocks (written back in full: T*K*F floats of HBM
# traffic at K = max_per_tile) and compacting the live chunks with an XLA
# chunk-gather (latency-bound: ~3.7 ms of the heavy bench step, device
# trace), the kernel DMAs each live chunk's gradient rows straight to its
# compacted row offset cstart[t]*chunk + c*chunk. Tiles own disjoint
# [cstart[t], cstart[t]+nchunks[t]) chunk ranges by construction (cstart =
# exclusive cumsum of nchunks), so the dynamic-offset writes cannot collide.
# Early-stopped tiles zero-write their remaining live chunks (their
# gradients are exactly zero — every pixel is past T_EPS) so the live range
# is fully initialized; rows past total_chunks stay garbage and are dropped
# by the live mask on the id column (_stream_bwd) plus the non-finite
# clamp in the reduce kernel.
# ---------------------------------------------------------------------------


def _bwd_stream_compact_kernel(counts_ref, tstart_ref, toff_ref, cstart_ref,
                               stream_ref, gacc_ref, gt_ref, tfin_ref,
                               gatot_ref, rows_out, scratch, sems, wscratch,
                               wsems, *, chunk, grid_x, C, K, n_tiles, group):
    s = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(s == 0)
    def _():
        _stream_issue(stream_ref, tstart_ref, scratch, sems, 0, 0, K, n_tiles,
                      group)

    @pl.when(s + 1 < nsteps)
    def _():
        _stream_issue(stream_ref, tstart_ref, scratch, sems, s + 1,
                      (s + 1) % 2, K, n_tiles, group)

    buf = s % 2
    for gi in range(group):
        _stream_wait(stream_ref, tstart_ref, scratch, sems, s, buf, gi, K,
                     n_tiles, group)
        t = s * group + gi
        live = t < n_tiles
        cnt = jnp.where(live, counts_ref[jnp.minimum(t, n_tiles - 1)], 0)
        nc = _nchunks(cnt, chunk)
        row0 = cstart_ref[jnp.minimum(t, n_tiles - 1)] * chunk
        # toff_ref: [n_tiles] ABSOLUTE tile id per (virtual) tile — under
        # tile windowing several consecutive kernel tiles map to one real
        # image tile, so pixel coords come from the table, not from
        # grid-index arithmetic
        px, py = _pixels(toff_ref[jnp.minimum(t, n_tiles - 1)], grid_x)

        gacc = gacc_ref[gi]  # [C, NPIX]
        g_t = gt_ref[gi, 0:1, :]
        t_final = tfin_ref[gi, 0:1, :]
        ga_total = gatot_ref[gi, 0:1, :]

        # write-DMA plumbing: double-buffered [chunk, LANES] staging, waits
        # two issues behind. Buffer indices are kept STATIC (Python wb) via
        # parity pl.when's — dynamic leading indices into VMEM scratch are a
        # Mosaic risk the read path never exercises.
        def w_copy(c, wb):
            return pltpu.make_async_copy(
                wscratch.at[wb],
                rows_out.at[pl.ds(row0 + c * chunk, chunk), :],
                wsems.at[wb],
            )

        def stage_and_issue(c, out_rows):
            for wb in (0, 1):
                @pl.when(c % 2 == wb)
                def _():
                    @pl.when(c >= 2)
                    def _():
                        w_copy(c - 2, wb).wait()
                    wscratch[wb] = out_rows
                    w_copy(c, wb).start()

        def cond(carry):
            c, _, _, done = carry
            return (c < nc) & (jnp.min(done) < 0.5)

        def body(carry):
            c, bacc, tvec, done = carry
            g = scratch[buf, gi, pl.ds(c * chunk, chunk), :]
            m = _chunk_blend_math(g, cnt, c, chunk, px, py, tvec, done)
            rows, b_inc = _chunk_grad_rows(
                g, m, gacc, g_t, t_final, ga_total, bacc, C
            )
            out_rows = jnp.concatenate(
                [rows, g[:, 6 + C:7 + C],
                 jnp.zeros((chunk, LANES - (7 + C)), jnp.float32)], axis=1
            )  # [chunk, LANES]: grads + id column + lane padding
            stage_and_issue(c, out_rows)
            return (c + 1, b_inc[-1:, :], m["new_t"], m["new_done"])

        carry0 = (
            jnp.int32(0),
            jnp.zeros((1, NPIX), jnp.float32),
            jnp.ones((1, NPIX), jnp.float32),
            jnp.zeros((1, NPIX), jnp.float32),
        )
        c_end, _, _, _ = jax.lax.while_loop(cond, body, carry0)

        # early exit leaves chunks [c_end, nc) of this tile's live range
        # unwritten; their gradients are exactly zero (all pixels are past
        # T_EPS), so zero-write them with the same wait discipline
        def zcond(c):
            return c < nc

        def zbody(c):
            stage_and_issue(c, jnp.zeros((chunk, LANES), jnp.float32))
            return c + 1

        c_fin = jax.lax.while_loop(zcond, zbody, c_end)

        # drain the (up to two) outstanding write DMAs before the next tile
        # reuses the staging buffers
        for wb in (0, 1):
            @pl.when((c_fin >= 2) & (c_fin % 2 == wb))
            def _():
                w_copy(c_fin - 2, wb).wait()

            @pl.when((c_fin >= 1) & ((c_fin - 1) % 2 == wb))
            def _():
                w_copy(c_fin - 1, wb).wait()


def blend_stream_pallas_bwd_compact(rows, counts, tstart, accum, t_final,
                                    g_accum, g_t, grid_x: int, chunk: int,
                                    K: int, n_fields: int, max_chunks: int,
                                    tile_offset=None):
    """-> compacted per-slot gradient rows [max_chunks*chunk, LANES]
    (columns [0, n_fields): dmean2d(2), dconic(3), dopac(1), dpayload(C),
    splat id; live range = the first sum(ceil(counts/chunk)) chunks)."""
    T = counts.shape[0]
    C = n_fields - 7
    if tile_offset is None:
        tile_offset = jnp.arange(T, dtype=jnp.int32)
    ga_total = jnp.sum(g_accum * accum, axis=1)  # [T, NPIX]
    nchunks = (counts + chunk - 1) // chunk
    cstart = (jnp.cumsum(nchunks) - nchunks).astype(jnp.int32)
    grp = stream_group(K)
    kern = functools.partial(_bwd_stream_compact_kernel, chunk=chunk,
                             grid_x=grid_x, C=C, K=K, n_tiles=T, group=grp)
    bspec = lambda shape: pl.BlockSpec(shape, lambda t, c, ts, to, cs: (t, 0, 0),
                                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=((T + grp - 1) // grp,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            bspec((grp, C, NPIX)),
            bspec((grp, 1, NPIX)),
            bspec((grp, 1, NPIX)),
            bspec((grp, 1, NPIX)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, grp, K, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, grp)),
            pltpu.VMEM((2, chunk, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((max_chunks * chunk, LANES),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts, tstart, tile_offset, cstart, rows, g_accum, g_t[:, None, :],
      t_final[:, None, :], ga_total[:, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14, 15))
def blend_tiles_pallas_stream(mean2d, conic, opac, payload, sorted_carry,
                              stream_ids, tstart, counts, tile_offset,
                              reduce_plan, chunk, grid_x, max_chunks,
                              max_per_tile, reduce_backend="auto",
                              bwd_layout="auto"):
    """sorted_carry: [P, D] f32 rows in sorted-slot order —
    (mean2d x/y, conic a/b/c, opac, payload..C) delivered by
    bin_gaussians(carry=...). mean2d/conic/opac/payload are the per-splat
    originals, used only as the cotangent structure (the custom backward
    computes their gradients by per-splat reduction). reduce_plan: a
    ReducePlan for frozen geometry (sort-free backward reduction) or None."""
    out, _ = _stream_fwd(mean2d, conic, opac, payload, sorted_carry,
                         stream_ids, tstart, counts, tile_offset, reduce_plan,
                         chunk, grid_x, max_chunks, max_per_tile,
                         reduce_backend, bwd_layout)
    return out


def _stream_fwd(mean2d, conic, opac, payload, sorted_carry, stream_ids,
                tstart, counts, tile_offset, reduce_plan, chunk, grid_x,
                max_chunks, max_per_tile, reduce_backend="auto",
                bwd_layout="auto"):
    n = payload.shape[0]
    # The splat INDEX rides the stream as one extra f32 column (exact below
    # 2^24): the backward writes it through to d_slot, so the per-splat
    # reduction reads ids from the same row-take that fetches the gradient
    # rows — an explicit [NC, chunk] window gather of the id stream lowers
    # to a per-element XLA gather and costs ~10 ms/step on v5e.
    assert n < 2**24, "stream kernel id column is exact f32 only below 2^24"
    rows = jnp.concatenate(
        [sorted_carry, stream_ids[:, None].astype(jnp.float32)], axis=-1
    )  # [P, f]
    f = rows.shape[1]
    # lane-pad the rows (DMA slices need a 128-multiple minor dim) and add
    # K rows of zero padding: windows of empty tail tiles read [P, P+K)
    rows = jnp.pad(
        rows, ((0, max_per_tile), (0, LANES - f))
    )
    acc, t_final = blend_stream_pallas_fwd(rows, counts, tstart, grid_x,
                                           chunk, max_per_tile, f,
                                           tile_offset)
    accum = jnp.swapaxes(acc, 1, 2)  # [T, NPIX, C]
    res = (rows, tstart, counts, tile_offset, reduce_plan, acc, t_final, n, f)
    return (accum, t_final), res


def _stream_bwd(chunk, grid_x, max_chunks, max_per_tile, reduce_backend,
                bwd_layout, res, cts):
    (rows, tstart, counts, tile_offset, reduce_plan, acc, t_final, n,
     f) = res
    n_carry = f - 1  # carry columns (id column excluded)
    T = counts.shape[0]
    K = max_per_tile
    F = f  # logical fields in d_slot (rows are lane-padded to LANES)
    ncpt = K // chunk
    g_accum, g_t = cts  # [T, NPIX, C], [T, NPIX]
    g_acc = jnp.swapaxes(g_accum, 1, 2)
    if bwd_layout == "auto":
        bwd_layout = BWD_LAYOUT
    NC = max_chunks
    nchunks = (counts + chunk - 1) // chunk
    chunk_base = jnp.cumsum(nchunks) - nchunks
    total_chunks = jnp.sum(nchunks)
    pchunk = jnp.arange(NC, dtype=jnp.int32)

    if bwd_layout == "compact":
        # the kernel writes each live chunk's gradient rows straight to its
        # compacted offset — no dense [T, K, F] staging, no chunk-gather
        rows_g = blend_stream_pallas_bwd_compact(
            rows, counts, tstart, acc, t_final, g_acc, g_t, grid_x, chunk,
            K, f, NC, tile_offset,
        )[:, :F]  # [NC*chunk, F]
        live = pchunk < total_chunks
    else:
        d_slot = blend_stream_pallas_bwd(
            rows, counts, tstart, acc, t_final, g_acc, g_t, grid_x, chunk,
            K, f, tile_offset,
        )  # [T, K, F]

        # per-splat reduction over live chunks (see _pallas_bwd for the
        # layout rationale); splat ids come straight from the sorted stream
        t_ids1 = jnp.where(nchunks > 0, jnp.arange(T, dtype=jnp.int32) + 1, 0)
        base_clip = jnp.minimum(chunk_base, NC - 1)
        marks = jnp.zeros((NC,), jnp.int32).at[base_clip].max(t_ids1)
        tile_of = jax.lax.cummax(marks) - 1
        live = (pchunk < total_chunks) & (tile_of >= 0)
        tile_safe = jnp.maximum(tile_of, 0)
        i_of = pchunk - chunk_base[tile_safe]
        dense_chunk = jnp.minimum(tile_safe * ncpt + i_of, T * ncpt - 1)
        rows_g = jnp.take(
            d_slot.reshape(T * ncpt, chunk, F), dense_chunk, axis=0
        ).reshape(NC * chunk, F)
    # ids come from the pass-through column of the gradient rows; dead
    # CHUNKS alias real rows (dense: clamped gather; compact: unwritten
    # garbage past total_chunks) and must still be dropped
    ids = rows_g[:, F - 1].astype(jnp.int32).reshape(NC, chunk)
    ids = jnp.where(live[:, None], ids, n).reshape(-1)
    per_gauss = _per_splat_reduce(rows_g[:, :F - 1], ids, n, reduce_backend,
                                  reduce_plan)
    per_gauss = jnp.concatenate(
        [per_gauss, jnp.zeros((n, 1), jnp.float32)], axis=-1
    )  # dead id column, keeps the slice layout below

    d_mean2d = per_gauss[:, 0:2]
    d_conic = per_gauss[:, 2:5]
    d_opac = per_gauss[:, 5]
    d_payload = per_gauss[:, 6:F - 1]
    zero_i = lambda s: np.zeros(s, jax.dtypes.float0)
    P_slots = rows.shape[0] - K
    d_carry = zero_i((P_slots, n_carry))
    d_plan = jax.tree.map(lambda x: np.zeros(x.shape, jax.dtypes.float0),
                          reduce_plan)
    return (d_mean2d, d_conic, d_opac, d_payload, d_carry,
            zero_i((P_slots,)), zero_i(tstart.shape),
            zero_i(counts.shape), zero_i(tile_offset.shape), d_plan)


blend_tiles_pallas_stream.defvjp(_stream_fwd, _stream_bwd)


# ---------------------------------------------------------------------------
# per-splat gradient reduction: sort by id + windowed one-hot MXU contraction
#
# The generic XLA segment_sum scatter-add is the single most expensive op of
# the training step (15.2 ms of a ~66 ms heavy step on v5e, device trace,
# VERDICT r2 item 1) — the reference CUDA backward does this reduction
# in-kernel with atomics. TPU has no atomics; instead:
#
#   1. sort the gradient rows by splat id (an XLA multi-operand sort, the
#      same machinery as binning's 4 ms carry sort);
#   2. partition the ID SPACE into windows of WSEG segments. Every row
#      belongs to exactly one window, so there is no boundary carry at all;
#      searchsorted gives each window's (chunk-aligned) row range;
#   3. a Pallas kernel loops each window over its row chunks and contracts
#      one-hot(id - window_base) [RCH, WSEG] with the gradient rows
#      [F, RCH] on the MXU -> [F, WSEG] per-splat sums. Over-read rows from
#      chunk alignment mask themselves out of the one-hot range.
#
# Rows are staged field-major [F16, Ppad] so the DMA minor dim is the
# (512-aligned) row axis and the matmul's lane dim is the 512-segment
# window — full MXU lane utilization at F ~ 12 fields.
# ---------------------------------------------------------------------------

WSEG = 512  # segments (splat ids) per window = out lanes per grid step
RCH = 512  # sorted rows per DMA chunk


def _reduce_kernel(nch_ref, lo_ref, rows_ref, out_ref, scratch, sems, *,
                   f16, id_row):
    w = pl.program_id(0)
    base = w * WSEG
    lo = lo_ref[w]  # first chunk index of this window
    nch = nch_ref[w]

    # rows_ref is chunk-blocked [NCH, F16, RCH]: the dynamic DMA offset sits
    # on the LEADING axis (the layout the stream kernels already exercise on
    # Mosaic) instead of a dynamic minor-dim offset
    def issue(c, buf):
        pltpu.make_async_copy(
            rows_ref.at[pl.ds(lo + c, 1), :, :],
            scratch.at[buf],
            sems.at[buf],
        ).start()

    def wait(c, buf):
        pltpu.make_async_copy(
            rows_ref.at[pl.ds(lo + c, 1), :, :],
            scratch.at[buf],
            sems.at[buf],
        ).wait()

    @pl.when(nch > 0)
    def _():
        issue(jnp.int32(0), 0)

    def cond(carry):
        c, _ = carry
        return c < nch

    def body(carry):
        c, acc = carry

        @pl.when(c + 1 < nch)
        def _():
            issue(c + 1, (c + 1) % 2)

        wait(c, c % 2)
        vals = scratch[c % 2, 0]  # [F16, RCH]
        # rows from the compact bwd layout can carry UNINITIALIZED values
        # past total_chunks (their ids are sentineled out of every window,
        # but NaN/inf values would still poison the whole window through the
        # one-hot contraction: NaN * 0 == NaN) — clamp non-finite to zero
        vals = jnp.where(jnp.isfinite(vals), vals, 0.0)
        ids = vals[id_row:id_row + 1, :]  # [1, RCH] f32 (exact ints)
        # tpu.iota only takes integer dtypes on real Mosaic (the CPU
        # interpreter accepts f32 — caught on chip): iota int32, then sitofp
        col = jax.lax.broadcasted_iota(
            jnp.int32, (WSEG, RCH), 0).astype(jnp.float32)
        # arithmetic broadcast [1,RCH]-[WSEG,RCH] is supported (sublane
        # broadcast of compare/select is not) -> compare at full shape
        onehot = ((ids - jnp.float32(base)) - col == 0.0).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            vals, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [F16, WSEG]
        return (c + 1, acc)

    _, acc = jax.lax.while_loop(
        cond, body, (jnp.int32(0), jnp.zeros((f16, WSEG), jnp.float32))
    )
    out_ref[0] = acc


class ReducePlan(NamedTuple):
    """Precomputed sort-free reduction order for FROZEN geometry.

    During stages 1-2.2 only ins_feat trains (models/optimizer.py zeroes
    every geometry LR past stage 0), so the backward's chunk-space splat-id
    layout is CONSTANT per view — the by-id sort that dominates the
    reduction (README roofline: ~4.6 ms of the backward) collapses to one
    cached-permutation row gather. Built once per view by
    rasterize.build_frozen_plan."""

    perm: jnp.ndarray  # [R] int32 row order by splat id
    ids_pad: jnp.ndarray  # [ppad] int32 sorted ids, sentinel-padded
    lo: jnp.ndarray  # [nw] int32 first RCH-chunk per WSEG-window
    nch: jnp.ndarray  # [nw] int32 chunk count per window


def chunk_space_ids(sorted_gauss, tstart, counts, chunk: int, NC: int,
                    n: int, max_per_tile: int) -> jnp.ndarray:
    """The backward's [NC*chunk] splat-id layout, computed analytically.

    Mirrors _stream_bwd's dense-path compaction EXACTLY (tile_of scatter +
    cummax, dead chunks sentineled to id n); the kernel instead passes ids
    through as a gradient-row column because an explicit window gather costs
    ~10 ms per step — at PLAN BUILD time (once per view) that cost is
    irrelevant. Rows beyond a tile's live count inside a live chunk keep
    the stream's id at that slot (zero-valued grads, harmless in the sum),
    exactly like the pass-through column."""
    T = counts.shape[0]
    nchunks = (counts + chunk - 1) // chunk
    chunk_base = jnp.cumsum(nchunks) - nchunks
    total_chunks = jnp.sum(nchunks)
    pchunk = jnp.arange(NC, dtype=jnp.int32)
    t_ids1 = jnp.where(nchunks > 0, jnp.arange(T, dtype=jnp.int32) + 1, 0)
    base_clip = jnp.minimum(chunk_base, NC - 1)
    marks = jnp.zeros((NC,), jnp.int32).at[base_clip].max(t_ids1)
    tile_of = jax.lax.cummax(marks) - 1
    live = (pchunk < total_chunks) & (tile_of >= 0)
    tile_safe = jnp.maximum(tile_of, 0)
    i_of = pchunk - chunk_base[tile_safe]
    # dead chunks alias the last dense chunk in _stream_bwd's gather; their
    # VALUES are real duplicated rows, so the id sentinel below is what
    # drops them — replicated here verbatim
    slot0 = tstart[tile_safe] + i_of * chunk
    slots = slot0[:, None] + jnp.arange(chunk, dtype=jnp.int32)[None, :]
    g_pad = jnp.concatenate(
        [sorted_gauss, jnp.zeros((max_per_tile,), jnp.int32)]
    )  # the stream rows are zero-padded by K rows -> id column 0 there
    ids = g_pad[jnp.clip(slots, 0, g_pad.shape[0] - 1)]
    ids = jnp.where(live[:, None], ids, n)
    return ids.reshape(-1)


def build_reduce_plan(ids, n: int) -> ReducePlan:
    """ReducePlan from a fixed chunk-space id layout (ids [R] int32)."""
    R = ids.shape[0]
    perm = jnp.argsort(ids).astype(jnp.int32)
    ids_s = ids[perm]
    nch_tot = -(-R // RCH) + 1
    ppad = nch_tot * RCH
    sentinel = jnp.int32(2**24)
    ids_pad = jnp.minimum(
        jnp.concatenate([ids_s, jnp.full((ppad - R,), sentinel, jnp.int32)]),
        sentinel,
    )
    nw = -(-n // WSEG)
    bounds = jnp.searchsorted(
        ids_s, jnp.arange(nw + 1, dtype=jnp.int32) * WSEG
    ).astype(jnp.int32)
    lo = bounds[:-1] // RCH
    nch = jnp.maximum(-(-(bounds[1:] - lo * RCH) // RCH), 0)
    return ReducePlan(perm=perm, ids_pad=ids_pad, lo=lo, nch=nch)


def sorted_segment_reduce(rows, ids, n: int, plan: ReducePlan | None = None):
    """sum rows [R, F] into [n, F] by ids [R] (out-of-range ids dropped),
    via sort-by-id + the windowed one-hot MXU kernel above. With a
    ReducePlan (frozen geometry), the F+1-operand sort becomes ONE row
    gather by the cached permutation and the window bounds come cached."""
    R, F = rows.shape
    f16 = -(-(F + 1) // 8) * 8  # gradient fields + the id row, 8-sublane pad
    nw = -(-n // WSEG)
    nch_tot = -(-R // RCH) + 1  # one extra all-sentinel chunk for over-reads
    ppad = nch_tot * RCH
    sentinel = jnp.int32(2**24)

    if plan is None:
        ops = jax.lax.sort(
            (ids.astype(jnp.int32),) + tuple(rows[:, i] for i in range(F)),
            num_keys=1, is_stable=False,
        )
        ids_s = ops[0]
        cols = ops[1:]
        ids_pad = jnp.concatenate(
            [ids_s, jnp.full((ppad - R,), sentinel, jnp.int32)]
        )
        # drop-sentineled rows (dead chunks aim at id >= n) also mask via the
        # one-hot, but their ids must stay exact in f32
        ids_pad = jnp.minimum(ids_pad, sentinel)
        bounds = jnp.searchsorted(
            ids_s, jnp.arange(nw + 1, dtype=jnp.int32) * WSEG
        ).astype(jnp.int32)
        lo = bounds[:-1] // RCH  # first chunk index per window
        nch = jnp.maximum(-(-(bounds[1:] - lo * RCH) // RCH), 0)
    else:
        rows_s = rows[plan.perm]  # [R, F] row gather replaces the sort
        cols = tuple(rows_s[:, i] for i in range(F))
        ids_pad, lo, nch = plan.ids_pad, plan.lo, plan.nch

    rows_b = jnp.zeros((nch_tot, f16, RCH), jnp.float32)
    for i in range(F):
        col = jnp.pad(cols[i], (0, ppad - R)).reshape(nch_tot, RCH)
        rows_b = rows_b.at[:, i, :].set(col)
    rows_b = rows_b.at[:, F, :].set(
        ids_pad.astype(jnp.float32).reshape(nch_tot, RCH)
    )

    kern = functools.partial(_reduce_kernel, f16=f16, id_row=F)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nw,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((1, f16, WSEG), lambda w, nc, lo_: (w, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 1, f16, RCH), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((nw, f16, WSEG), jnp.float32),),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(nch, lo, rows_b)
    return out.transpose(0, 2, 1).reshape(nw * WSEG, f16)[:n, :F]


# Default per-splat reduction backend: "sorted_mxu" (above) or "scatter"
# (the original jax.ops.segment_sum). RasterizeConfig.reduce_backend="auto"
# resolves to this at TRACE time — the config field is the per-call-site
# switch (part of the jit cache key); this module default only sets what
# "auto" means.
# On-chip 2x2 A/B (v5e, 2026-08-18, tools/ab_reduce.py --iters 20, parity
# gates < 1e-4 on every variant): sorted_mxu/dense wins both workloads —
# heavy 66.1 -> 59.7 ms/step (19.0 -> 21.0 Mpix/s), calibrated 45.0 ms
# (27.9 Mpix/s). compact layout loses ~1.4 ms when stacked on sorted_mxu
# (the in-kernel compacted-offset DMAs cost more than the XLA chunk
# compaction they replace), so BWD_LAYOUT stays "dense".
REDUCE_BACKEND = "sorted_mxu"

# Default backward d_slot layout: "dense" ([T, K, F] BlockSpec blocks + XLA
# chunk compaction) or "compact" (direct compacted-offset DMA writes,
# blend_stream_pallas_bwd_compact). Same trace-time resolution contract as
# REDUCE_BACKEND: RasterizeConfig.bwd_layout="auto" reads this.
BWD_LAYOUT = "dense"  # validated on chip; loses to dense when A/B'd (above)


def _per_splat_reduce(rows, ids, n: int, backend: str = "auto",
                      plan: ReducePlan | None = None):
    if backend == "auto":
        backend = REDUCE_BACKEND
    # ids ride the kernel as exact f32 -> above 2^24 splats use the scatter
    # (the binning sort has the same threshold, ops/binning.py:113)
    if backend == "sorted_mxu" and n <= 2**24:
        return sorted_segment_reduce(rows, ids, n, plan)
    if SORTED_REDUCE:
        out = jax.lax.sort(
            (ids,) + tuple(rows[:, i] for i in range(rows.shape[1])),
            num_keys=1, is_stable=False,
        )
        rows_s = jnp.stack(out[1:], axis=-1)
        return jax.ops.segment_sum(
            rows_s, out[0], num_segments=n, indices_are_sorted=True
        )
    return jax.ops.segment_sum(rows, ids, num_segments=n)


# ---------------------------------------------------------------------------
# custom-VJP wrapper with the same contract as rasterize._blend_tiles
# ---------------------------------------------------------------------------


def _make_gdata(mean2d, conic, opac, payload, idx):
    table = jnp.concatenate(
        [mean2d, conic, opac[:, None], payload], axis=-1
    )  # [N, 6+C]
    return table[idx]  # [T, K, 6+C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def blend_tiles_pallas(mean2d, conic, opac, payload, idx, counts,
                       tile_offset, chunk, grid_x, max_chunks):
    out, _ = _pallas_fwd(mean2d, conic, opac, payload, idx, counts,
                         tile_offset, chunk, grid_x, max_chunks)
    return out


def _pallas_fwd(mean2d, conic, opac, payload, idx, counts, tile_offset,
                chunk, grid_x, max_chunks):
    gdata = _make_gdata(mean2d, conic, opac, payload, idx)
    acc, t_final = blend_tiles_pallas_fwd(gdata, counts, grid_x, chunk,
                                          tile_offset)
    accum = jnp.swapaxes(acc, 1, 2)  # [T, NPIX, C]
    res = (gdata, idx, counts, tile_offset, acc, t_final, payload.shape[0])
    return (accum, t_final), res


def _pallas_bwd(chunk, grid_x, max_chunks, res, cts):
    gdata, idx, counts, tile_offset, acc, t_final, n = res
    T, K, F = gdata.shape
    ncpt = K // chunk  # dense chunks per tile
    g_accum, g_t = cts  # [T, NPIX, C], [T, NPIX]
    g_acc = jnp.swapaxes(g_accum, 1, 2)  # [T, C, NPIX]
    d_slot = blend_tiles_pallas_bwd(
        gdata, counts, acc, t_final, g_acc, g_t, grid_x, chunk, tile_offset
    )  # [T, K, F]

    # Per-splat reduction. A per-slot row gather of the live slots costs
    # ~35 ms on v5e (40-byte rows, latency-bound); compacting at CHUNK
    # granularity instead moves the same data in chunk*F*4-byte rows, which
    # is bandwidth-bound and ~10x cheaper. Live chunks of each tile are
    # enumerated with the same mark+cummax expansion used in binning.
    NC = max_chunks  # static upper bound on live chunks
    nchunks = (counts + chunk - 1) // chunk  # [T]
    chunk_base = jnp.cumsum(nchunks) - nchunks
    total_chunks = jnp.sum(nchunks)

    t_ids1 = jnp.where(nchunks > 0, jnp.arange(T, dtype=jnp.int32) + 1, 0)
    base_clip = jnp.minimum(chunk_base, NC - 1)
    marks = jnp.zeros((NC,), jnp.int32).at[base_clip].max(t_ids1)
    tile_of = jax.lax.cummax(marks) - 1  # [NC] owning tile per live chunk
    pchunk = jnp.arange(NC, dtype=jnp.int32)
    live = (pchunk < total_chunks) & (tile_of >= 0)
    tile_safe = jnp.maximum(tile_of, 0)
    i_of = pchunk - chunk_base[tile_safe]  # chunk index within tile
    # Dead SLOTS inside live chunks need no mask at all — the kernel
    # zero-fills its output block, so their gradients are exactly zero and
    # their gauss_idx of 0 contributes 0 to splat 0. Dead CHUNKS gather
    # arbitrary rows (clamp mode) but their ids are pointed out of range,
    # which JAX scatter semantics drop. The gathers use slice shape
    # (1, chunk, F) so every reshape is a free leading-dim split/merge —
    # merging (chunk, F) into one axis costs two ~3 ms lane relayouts.
    dense_chunk = jnp.minimum(tile_safe * ncpt + i_of, T * ncpt - 1)
    rows = jnp.take(
        d_slot.reshape(T * ncpt, chunk, F), dense_chunk, axis=0
    ).reshape(NC * chunk, F)
    ids = jnp.take(idx.reshape(T * ncpt, chunk), dense_chunk, axis=0)
    ids = jnp.where(live[:, None], ids, n).reshape(-1)
    # the dense layout exists for vmapped group renders, and the sorted-MXU
    # kernel's manual DMAs do not batch under vmap — keep the scatter here
    # (group backwards are off the training hot path)
    per_gauss = jax.ops.segment_sum(rows, ids, num_segments=n)

    d_mean2d = per_gauss[:, 0:2]
    d_conic = per_gauss[:, 2:5]
    d_opac = per_gauss[:, 5]
    d_payload = per_gauss[:, 6:]
    zero_i = lambda s: np.zeros(s, jax.dtypes.float0)
    return (d_mean2d, d_conic, d_opac, d_payload, zero_i(idx.shape),
            zero_i(counts.shape), zero_i(tile_offset.shape))


blend_tiles_pallas.defvjp(_pallas_fwd, _pallas_bwd)
