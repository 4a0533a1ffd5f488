"""Ablation phase bench: wall-clock the pipeline prefixes on the real chip.

The axon tunnel does not always expose a device track to jax.profiler (the
trace_step fallback then only shows host threads), so this tool recovers a
coarse phase split by TIMING PIPELINE PREFIXES with the exact bench.py
methodology (jit, warmup, 20 timed iters, block_until_ready):

    null        jitted no-op (per-call dispatch floor of the tunnel; the
                `proj` row carries this fixed cost, the deltas cancel it)
    proj        projection only (cull, cov2d, radii)
    proj+bin    + stream binning (carry pack, sort, searchsorted)
    fwd(kernel) + Pallas blend forward, raw tile buffers (no untile/loss)
    fwd         + image assembly (untile) + L1 loss
    fwd+bwd     + full backward (blend bwd kernel, reduction, projection VJP)

Successive differences approximate per-phase device cost (XLA fuses slightly
differently per prefix, so treat deltas as ~1 ms accurate).

Usage:
    python tools/phase_bench.py            # calibrated workload
    python tools/phase_bench.py --heavy
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--heavy", action="store_true")
    ap.add_argument("--recipe", action="store_true",
                    help="profile the ScanNet recipe shape (648x484) "
                    "instead of the 1296x968 bench frame")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reduce", default=None,
                    help="override reduce_backend (scatter|sorted_mxu)")
    ap.add_argument("--layout", default=None,
                    help="override bwd_layout (dense|compact)")
    args = ap.parse_args()
    if args.recipe:
        os.environ["OG_BENCH_WIDTH"] = "648"
        os.environ["OG_BENCH_HEIGHT"] = "484"

    import dataclasses

    import jax
    import jax.numpy as jnp

    from bench import WIDTH, HEIGHT, make_workload
    from opengaussian_tpu.ops.projection import TILE, build_cov3d, project
    from opengaussian_tpu.ops.rasterize import _prepare
    from opengaussian_tpu.render import render
    from opengaussian_tpu.train import losses

    scale = 0.15 if args.heavy else 0.088
    state, cam, rcfg, gt, bg, make_fwd_bwd = make_workload(scale)
    if args.reduce:
        rcfg = dataclasses.replace(rcfg, reduce_backend=args.reduce)
    if args.layout:
        rcfg = dataclasses.replace(rcfg, bwd_layout=args.layout)
    print(f"workload: scale={scale} P={rcfg.max_intersections(state.capacity)} "
          f"K={rcfg.max_per_tile} reduce={rcfg.reduce_backend} "
          f"layout={rcfg.bwd_layout} device={jax.default_backend()}",
          flush=True)

    def timed(fn, st):
        # iteration-varying scalar folded into the opacity: the axon tunnel
        # memoizes identical-args calls (trace_step pitfall; micro_bench and
        # bin_bisect defeat it the same way), so fixed-input loops here
        # would "measure" near-zero exactly when the profiler fallback this
        # tool exists for is in play.
        out = fn(jnp.int32(0), st)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fn(jnp.int32(i + 1), st)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    def perturb(gs, i):
        return dataclasses.replace(
            gs, logit_opacity=gs.logit_opacity + 1e-6 * i.astype(jnp.float32))

    @jax.jit
    def proj_only(i, gs):
        gs = perturb(gs, i)
        p = project(gs.means, build_cov3d(gs.scales, gs.quats), cam,
                    opacities=gs.opacity)
        return (jnp.sum(p.mean2d), jnp.sum(p.conic), jnp.sum(p.depth),
                jnp.sum(p.num_tiles), jnp.sum(p.radius))

    @jax.jit
    def proj_bin(i, gs):
        gs = perturb(gs, i)
        payload = jnp.zeros((gs.capacity, 3))
        proj, bins, pix, grids = _prepare(
            cam, gs.means, build_cov3d(gs.scales, gs.quats), rcfg, None,
            gs.opacity, payload=payload,
        )
        outs = [jnp.sum(bins.counts), bins.total]
        if bins.sorted_gauss is not None:
            outs.append(jnp.sum(bins.sorted_gauss))
            if bins.sorted_carry is not None:
                outs.append(jnp.sum(bins.sorted_carry, axis=0))
        else:
            outs.append(jnp.sum(bins.gauss_idx))
        return tuple(outs)

    @jax.jit
    def null_fn(i, gs):
        return gs.logit_opacity[0] + i

    @jax.jit
    def fwd_kernel(i, gs):
        # the color pass exactly as rasterize() runs it, stopped after the
        # Pallas stream blend: raw [T, 256, C] tile accumulators, no untile,
        # no loss — splits the fwd delta into kernel vs assembly+loss.
        from opengaussian_tpu.ops.rasterize_pallas import (
            blend_tiles_pallas_stream,
        )
        from opengaussian_tpu.ops.sh import sh_to_rgb

        gs = perturb(gs, i)
        payload = sh_to_rgb(3, gs.sh, gs.means, cam.cam_center)
        proj, bins, pix, grids = _prepare(
            cam, gs.means, build_cov3d(gs.scales, gs.quats), rcfg, None,
            gs.opacity, payload=payload,
        )
        opac = jnp.where(proj.valid, gs.opacity, 0.0)
        full_payload = jnp.concatenate(
            [payload, proj.depth[:, None]], axis=-1)
        n = proj.mean2d.shape[0]
        n_band = bins.counts.shape[0]
        max_chunks = rcfg.max_intersections(n) // rcfg.chunk + n_band
        accum, t_final = blend_tiles_pallas_stream(
            proj.mean2d, proj.conic, opac, full_payload, bins.sorted_carry,
            bins.sorted_gauss, bins.tile_start, bins.counts,
            (bins.vt_real if bins.vt_real is not None
             else jnp.arange(n_band, dtype=jnp.int32)),
            None, rcfg.chunk, grids[0], max_chunks,
            rcfg.max_per_tile, rcfg.reduce_backend, rcfg.bwd_layout,
        )
        return jnp.sum(accum), jnp.sum(t_final)

    @jax.jit
    def fwd(i, gs):
        out = render(cam, perturb(gs, i), bg, 3, rcfg)
        return losses.l1_loss(out.render, gt)

    _fwd_bwd = make_fwd_bwd(rcfg)

    @jax.jit
    def fwd_bwd(i, gs):
        return _fwd_bwd(perturb(gs, i))

    rows = [
        ("null", timed(null_fn, state)),
        ("proj", timed(proj_only, state)),
        ("proj+bin", timed(proj_bin, state)),
        ("fwd(kernel)", timed(fwd_kernel, state)),
        ("fwd(+loss)", timed(fwd, state)),
        ("fwd+bwd", timed(fwd_bwd, state)),
    ]
    print(f"\n{'prefix':<12} {'ms/step':>9} {'delta':>9}")
    prev = 0.0
    for name, ms in rows:
        print(f"{name:<12} {ms:9.2f} {ms - prev:9.2f}")
        prev = ms
    total = rows[-1][1]
    mpix = WIDTH * HEIGHT / total / 1e3
    print(f"\nfwd+bwd: {total:.2f} ms/step = {mpix:.2f} Mpix/s")


if __name__ == "__main__":
    main()
