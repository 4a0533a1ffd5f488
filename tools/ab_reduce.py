"""A/B the stream-backward variants on the current device.

Crosses reduce_backend="scatter" (jax.ops.segment_sum) x "sorted_mxu"
(sort + windowed one-hot MXU contraction, sorted_segment_reduce) with
bwd_layout="dense" ([T, K, F] blocks + XLA chunk compaction) x "compact"
(direct compacted-offset DMA writes) on the bench workloads:

  * asserts gradient parity of every variant against scatter/dense (the
    cheap correctness gate for the Mosaic lowerings);
  * times the full fwd+bwd step per variant at the calibrated and r1-heavy
    workloads with CHAINED iterations (x = f(x)-style state threading
    defeats the axon memoization pitfall);
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
        variants = [
            ("scatter", "dense"),
            ("sorted_mxu", "dense"),
            ("scatter", "compact"),
            ("sorted_mxu", "compact"),
        ]
        for backend, layout in variants:
            # per-call-site static switches: part of the jit cache key
            cfg = dataclasses.replace(rcfg, reduce_backend=backend,
                                      bwd_layout=layout)
            f = make_fwd_bwd(cfg)
            loss, grads = f(state)
            jax.block_until_ready((loss, grads))
            grads_by_backend[(backend, layout)] = grads
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
            results[(name, backend, layout)] = (dt * 1e3, mpix)
            print(f"  {backend:10s} {layout:8s} {dt * 1e3:8.2f} ms/step  "
                  f"{mpix:7.2f} Mpix/s", flush=True)

        if not args.skip_parity:
            ref = grads_by_backend[("scatter", "dense")]
            for key, got in grads_by_backend.items():
                if key == ("scatter", "dense"):
                    continue
                for k in ref:
                    s = float(jnp.abs(ref[k]).max()) or 1.0
                    err = float(jnp.abs(got[k] - ref[k]).max()) / s
                    assert err < 1e-4, (key, k, err)
            print(f"  parity ok (normalized grad diff < 1e-4, all variants)",
                  flush=True)

    base = results[("heavy", "scatter", "dense")][0]
    best = min(results, key=lambda k: results[k][0] if k[0] == "heavy" else 1e9)
    print(f"\nheavy-step best: {best[1]}/{best[2]} at "
          f"{results[best][0]:.2f} ms ({base - results[best][0]:+.2f} ms vs "
          f"scatter/dense)")


if __name__ == "__main__":
    main()
