"""A/B the backward per-splat reduction backends on the current device.

Compares REDUCE_BACKEND="scatter" (jax.ops.segment_sum) against
"sorted_mxu" (sort + windowed one-hot MXU contraction,
ops/rasterize_pallas.sorted_segment_reduce) on the bench workloads:

  * asserts gradient parity between the two backends first (the cheap
    correctness gate for the Mosaic lowering);
  * times the full fwd+bwd step for each backend at the calibrated and
    r1-heavy workloads with CHAINED iterations (x = f(x)-style state
    threading defeats the axon memoization pitfall);
  * prints a table + the recommendation.

Run on the real chip: python tools/ab_reduce.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    import bench

    print(f"device: {jax.devices()[0]}", flush=True)

    results = {}
    for scale, name in [(0.088, "calibrated"), (0.15, "heavy")]:
        state, cam, rcfg, gt, bg, make_fwd_bwd = bench.make_workload(scale)
        print(f"[{name}] P={rcfg.max_intersections(state.capacity)} "
              f"K={rcfg.max_per_tile}", flush=True)
        grads_by_backend = {}
        for backend in ("scatter", "sorted_mxu"):
            # per-call-site static switch: part of the jit cache key
            cfg = dataclasses.replace(rcfg, reduce_backend=backend)
            f = make_fwd_bwd(cfg)
            loss, grads = f(state)
            jax.block_until_ready((loss, grads))
            grads_by_backend[backend] = grads
            # chained timing: thread a tiny but NONZERO grad step back into
            # the params so the argument VALUES change every iteration
            # (0.0*grads would re-present identical args — the exact
            # memoization pitfall this guards against)
            st = state
            t0 = time.perf_counter()
            for _ in range(args.iters):
                loss, grads = f(st)
                p = st.params()
                p = {k: p[k] - 1e-8 * grads[k] for k in p}
                st = st.with_params(p)
            jax.block_until_ready(loss)
            dt = (time.perf_counter() - t0) / args.iters
            mpix = bench.WIDTH * bench.HEIGHT / dt / 1e6
            results[(name, backend)] = (dt * 1e3, mpix)
            print(f"  {backend:10s} {dt * 1e3:8.2f} ms/step  {mpix:7.2f} Mpix/s",
                  flush=True)

        if not args.skip_parity:
            ref = grads_by_backend["scatter"]
            got = grads_by_backend["sorted_mxu"]
            for k in ref:
                s = float(jnp.abs(ref[k]).max()) or 1.0
                err = float(jnp.abs(got[k] - ref[k]).max()) / s
                assert err < 1e-4, (k, err)
            print(f"  parity ok (normalized grad diff < 1e-4)", flush=True)

    sc = results[("heavy", "scatter")][0]
    sm = results[("heavy", "sorted_mxu")][0]
    print(f"\nheavy-step delta: {sc - sm:+.2f} ms "
          f"({'sorted_mxu wins' if sm < sc else 'scatter wins'})")


if __name__ == "__main__":
    main()
