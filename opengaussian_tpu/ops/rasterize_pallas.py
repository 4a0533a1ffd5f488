"""Fused Pallas TPU blend kernels (forward + backward).

Drop-in replacement for the XLA lax.scan blend in ops/rasterize.py. Same
semantics (ops/blend.py: alpha clamp at 0.99, 1/255 skip, permanent early
stop below T=1e-4), restructured for the TPU memory hierarchy:

  * grid (tile, chunk): each tile's running transmittance, early-stop flag,
    and C-channel accumulator live in VMEM scratch across the chunk loop —
    the XLA path round-trips this carry through HBM every scan step, which
    dominates its runtime;
  * per-(splat,pixel) alpha math is VPU work on [chunk, 256] blocks; the
    sequential-compositing cumulative product is computed EXACTLY with
    log2(chunk) shift-doubling multiplies (no transcendental log/exp) and
    compositing is one [C, chunk] x [chunk, 256] MXU contraction per chunk;
  * chunks past a tile's splat count are skipped entirely (scalar-prefetched
    counts), so sparse tiles cost ~nothing — the XLA path always scans the
    full per-tile budget;
  * the backward kernel replays the forward (storing only final T and the
    premultiplied accumulation, like the reference CUDA backward) and emits
    per-slot gradients, reduced to per-splat gradients by one segment-sum.

Splat data is pre-gathered outside the kernel into [T, K, F] rows
(F = mean2d(2) + conic(3) + opacity(1) + payload(C)) — one fast XLA gather.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opengaussian_tpu.ops import blend
from opengaussian_tpu.ops.projection import TILE

NPIX = TILE * TILE  # 256 pixels per tile


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cumulative(x, op, shifts_axis=0, exclusive_fill=None):
    """Inclusive cumulative op along axis 0 via shift-doubling (exact same
    tree order as jnp.cum* on TPU up to reassociation; 6 steps for 64)."""
    k = x.shape[shifts_axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, shifts_axis)
    s = 1
    while s < k:
        shifted = pltpu.roll(x, s, axis=shifts_axis)
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
    """Shared forward math for one chunk. Returns per-chunk tensors."""
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
    cum = _cumulative(factors, jnp.multiply)  # inclusive cumprod
    excl = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, cum.shape, 0) == 0,
        1.0,
        pltpu.roll(cum, 1, axis=0),
    )
    t_in = tvec[0:1, :]
    t_prev = t_in * excl
    t_seq = t_prev * factors
    active = a > 0.0
    fail = active & (t_seq < blend.T_EPS)
    fail_cum = _cumulative(fail.astype(jnp.float32), jnp.add)
    fail_before = (fail_cum - fail.astype(jnp.float32)) > 0.0
    done_b = (done[0:1, :] > 0.0) | fail_before
    contrib = active & ~done_b & ~fail
    w = jnp.where(contrib, a * t_prev, 0.0)

    any_fail = jnp.max(fail.astype(jnp.float32), axis=0, keepdims=True)
    first_fail = fail & ~fail_before
    t_freeze = jnp.sum(jnp.where(first_fail, t_prev, 0.0), axis=0, keepdims=True)
    t_last = t_seq[-1:, :]
    new_t = jnp.where(
        done[0:1, :] > 0.0,
        t_in,
        jnp.where(any_fail > 0.0, t_freeze, t_last),
    )
    new_done = jnp.maximum(done[0:1, :], any_fail)
    return dict(
        a=a, araw=araw, gauss=gauss, w=w, t_prev=t_prev, contrib=contrib,
        dx=dx, dy=dy, ca=ca, cb=cb, cc=cc, opac=opac,
        new_t=new_t, new_done=new_done,
    )


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(counts_ref, gdata_ref, acc_out, t_out, acc, tvec, done,
                *, chunk, grid_x, C):
    t = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(c == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        tvec[:] = jnp.ones_like(tvec)
        done[:] = jnp.zeros_like(done)

    cnt = counts_ref[t]

    @pl.when(c * chunk < cnt)
    def _():
        g = gdata_ref[0]  # [Kc, F]
        px, py = _pixels(t, grid_x)
        m = _chunk_blend_math(g, cnt, c, chunk, px, py, tvec, done)
        pay = g[:, 6:]  # [Kc, C]
        acc[:] += jax.lax.dot_general(
            pay, m["w"], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [C, NPIX]
        tvec[0:1, :] = m["new_t"]
        done[0:1, :] = m["new_done"]

    @pl.when(c == nc - 1)
    def _():
        acc_out[0] = acc[:]
        t_out[0] = tvec[0:1, :]


def blend_tiles_pallas_fwd(gdata, counts, grid_x: int, chunk: int):
    """gdata [T, K, F] (F = 6 + C), counts [T] -> (accum [T, C, NPIX],
    t_final [T, NPIX])."""
    T, K, F = gdata.shape
    C = F - 6
    nc = K // chunk
    kern = functools.partial(_fwd_kernel, chunk=chunk, grid_x=grid_x, C=C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, nc),
        in_specs=[
            pl.BlockSpec((1, chunk, F), lambda t, c, counts: (t, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, C, NPIX), lambda t, c, counts: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NPIX), lambda t, c, counts: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, NPIX), jnp.float32),
            pltpu.VMEM((8, NPIX), jnp.float32),
            pltpu.VMEM((8, NPIX), jnp.float32),
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
    )(counts, gdata)
    return acc, t_final[:, 0, :]


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(counts_ref, gdata_ref, gacc_ref, gt_ref, tfin_ref, gatot_ref,
                dslot_out, tvec, done, bacc, *, chunk, grid_x, C):
    t = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        tvec[:] = jnp.ones_like(tvec)
        done[:] = jnp.zeros_like(done)
        bacc[:] = jnp.zeros_like(bacc)

    cnt = counts_ref[t]
    dslot_out[0] = jnp.zeros_like(dslot_out[0])

    @pl.when(c * chunk < cnt)
    def _():
        g = gdata_ref[0]  # [Kc, F]
        px, py = _pixels(t, grid_x)
        m = _chunk_blend_math(g, cnt, c, chunk, px, py, tvec, done)
        gacc = gacc_ref[0]  # [C, NPIX]
        g_t = gt_ref[0:1, 0, :]  # [1, NPIX]
        t_final = tfin_ref[0:1, 0, :]
        ga_total = gatot_ref[0:1, 0, :]
        pay = g[:, 6:]

        # gc[k,p] = sum_c g_accum[c,p] * payload[k,c]
        gc = jax.lax.dot_general(
            pay, gacc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Kc, NPIX]
        u = m["w"] * gc
        b_inc = bacc[0:1, :] + _cumulative(u, jnp.add)
        one_m_a = jnp.maximum(1.0 - m["a"], 1.0 - blend.ALPHA_MAX)
        d_alpha = jnp.where(
            m["contrib"],
            m["t_prev"] * gc
            - (ga_total - b_inc) / one_m_a
            - (g_t * t_final) / one_m_a,
            0.0,
        )
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
        dslot_out[0] = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_o, d_pay], axis=1
        )

        tvec[0:1, :] = m["new_t"]
        done[0:1, :] = m["new_done"]
        bacc[0:1, :] = bacc[0:1, :] + jnp.sum(u, axis=0, keepdims=True)


def blend_tiles_pallas_bwd(gdata, counts, accum, t_final, g_accum, g_t,
                           grid_x: int, chunk: int):
    """-> d_slot [T, K, F] (layout: dmean2d(2), dconic(3), dopac(1),
    dpayload(C)) — per-slot gradients, to be segment-summed by splat id."""
    T, K, F = gdata.shape
    C = F - 6
    nc = K // chunk
    ga_total = jnp.sum(g_accum * accum, axis=1)  # [T, NPIX]
    kern = functools.partial(_bwd_kernel, chunk=chunk, grid_x=grid_x, C=C)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T, nc),
        in_specs=[
            pl.BlockSpec((1, chunk, F), lambda t, c, counts: (t, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, NPIX), lambda t, c, counts: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NPIX), lambda t, c, counts: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NPIX), lambda t, c, counts: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, NPIX), lambda t, c, counts: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, F), lambda t, c, counts: (t, c, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((8, NPIX), jnp.float32),
            pltpu.VMEM((8, NPIX), jnp.float32),
            pltpu.VMEM((8, NPIX), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, K, F), jnp.float32),
        grid_spec=grid_spec,
        interpret=_use_interpret(),
    )(counts, gdata, g_accum, g_t[:, None, :], t_final[:, None, :],
      ga_total[:, None, :])


# ---------------------------------------------------------------------------
# custom-VJP wrapper with the same contract as rasterize._blend_tiles
# ---------------------------------------------------------------------------


def _make_gdata(mean2d, conic, opac, payload, idx):
    table = jnp.concatenate(
        [mean2d, conic, opac[:, None], payload], axis=-1
    )  # [N, 6+C]
    return table[idx]  # [T, K, 6+C]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def blend_tiles_pallas(mean2d, conic, opac, payload, idx, counts,
                       slot_dense_pos, slot_gauss, slot_ok, chunk, grid_x):
    out, _ = _pallas_fwd(mean2d, conic, opac, payload, idx, counts,
                         slot_dense_pos, slot_gauss, slot_ok, chunk, grid_x)
    return out


def _pallas_fwd(mean2d, conic, opac, payload, idx, counts, slot_dense_pos,
                slot_gauss, slot_ok, chunk, grid_x):
    gdata = _make_gdata(mean2d, conic, opac, payload, idx)
    acc, t_final = blend_tiles_pallas_fwd(gdata, counts, grid_x, chunk)
    accum = jnp.swapaxes(acc, 1, 2)  # [T, NPIX, C]
    res = (gdata, idx, counts, slot_dense_pos, slot_gauss, slot_ok, acc,
           t_final, payload.shape[0])
    return (accum, t_final), res


def _pallas_bwd(chunk, grid_x, res, cts):
    (gdata, idx, counts, slot_dense_pos, slot_gauss, slot_ok, acc, t_final,
     n) = res
    g_accum, g_t = cts  # [T, NPIX, C], [T, NPIX]
    g_acc = jnp.swapaxes(g_accum, 1, 2)  # [T, C, NPIX]
    d_slot = blend_tiles_pallas_bwd(
        gdata, counts, acc, t_final, g_acc, g_t, grid_x, chunk
    )  # [T, K, 6+C]
    F = d_slot.shape[-1]
    flat = d_slot.reshape(-1, F)
    # collision-free reduction: original slots are per-splat contiguous, so
    # a unique gather + sorted segment-sum replaces a colliding scatter-add
    per_slot = jnp.where(slot_ok[:, None], flat[slot_dense_pos], 0.0)
    per_gauss = jax.ops.segment_sum(
        per_slot, slot_gauss, num_segments=n, indices_are_sorted=True
    )
    d_mean2d = per_gauss[:, 0:2]
    d_conic = per_gauss[:, 2:5]
    d_opac = per_gauss[:, 5]
    d_payload = per_gauss[:, 6:]
    zero_i = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (d_mean2d, d_conic, d_opac, d_payload, zero_i(idx), zero_i(counts),
            zero_i(slot_dense_pos), zero_i(slot_gauss), zero_i(slot_ok))


blend_tiles_pallas.defvjp(_pallas_fwd, _pallas_bwd)
