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
  * methodology (VERDICT r3 weak 5): every variant is compiled + warmed
    FIRST, then >=3 timed repetitions run with the variant order RE-SHUFFLED
    per repetition; the first repetition is discarded (first-variant warmup
    pollution is what produced the r3 scatter/dense outlier) and the median
    of the kept reps is reported;
  * prints a table + the recommendation, and optionally writes JSON (--out).

Run on the real chip: python tools/ab_reduce.py [--iters 20] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = [
    ("scatter", "dense"),
    ("sorted_mxu", "dense"),
    ("scatter", "compact"),
    ("sorted_mxu", "compact"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions AFTER the discarded warmup rep")
    ap.add_argument("--out", default=None, help="write results JSON here")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    import bench

    print(f"device: {jax.devices()[0]}", flush=True)
    order_rng = np.random.default_rng(0)

    def timed_once(f, state):
        """One chained-iteration measurement -> ms/step. Threading a tiny
        but NONZERO grad step back into the params changes the argument
        VALUES every iteration (0.0*grads would re-present identical args —
        the exact memoization pitfall this guards against)."""
        st = state
        t0 = time.perf_counter()
        for _ in range(args.iters):
            loss, grads = f(st)
            p = st.params()
            p = {k: p[k] - 1e-8 * grads[k] for k in p}
            st = st.with_params(p)
        jax.block_until_ready(loss)
        return (time.perf_counter() - t0) / args.iters * 1e3

    results = {}
    for scale, name in [(0.088, "calibrated"), (0.15, "heavy")]:
        state, cam, rcfg, gt, bg, make_fwd_bwd = bench.make_workload(scale)
        print(f"[{name}] P={rcfg.max_intersections(state.capacity)} "
              f"K={rcfg.max_per_tile}", flush=True)

        # compile + warm every variant BEFORE any timing, and grab grads
        # for the parity gate
        fns, grads_by_backend = {}, {}
        for backend, layout in VARIANTS:
            cfg = dataclasses.replace(rcfg, reduce_backend=backend,
                                      bwd_layout=layout)
            f = make_fwd_bwd(cfg)
            loss, grads = f(state)
            jax.block_until_ready((loss, grads))
            fns[(backend, layout)] = f
            grads_by_backend[(backend, layout)] = grads

        if not args.skip_parity:
            ref = grads_by_backend[("scatter", "dense")]
            for key, got in grads_by_backend.items():
                if key == ("scatter", "dense"):
                    continue
                for k in ref:
                    s = float(jnp.abs(ref[k]).max()) or 1.0
                    err = float(jnp.abs(got[k] - ref[k]).max()) / s
                    assert err < 1e-4, (key, k, err)
            print("  parity ok (normalized grad diff < 1e-4, all variants)",
                  flush=True)

        # rep 0 is discarded; each rep shuffles the variant order so no
        # variant systematically pays residual warmup/caching effects
        samples = {v: [] for v in VARIANTS}
        for rep in range(args.reps + 1):
            order = list(VARIANTS)
            order_rng.shuffle(order)
            for v in order:
                ms = timed_once(fns[v], state)
                if rep > 0:
                    samples[v].append(ms)
                tag = "discarded" if rep == 0 else f"rep{rep}"
                print(f"  [{tag}] {v[0]:10s} {v[1]:8s} {ms:8.2f} ms/step",
                      flush=True)

        for v in VARIANTS:
            med = float(np.median(samples[v]))
            mpix = bench.WIDTH * bench.HEIGHT / (med / 1e3) / 1e6
            results[(name,) + v] = dict(
                ms_per_step_median=round(med, 3),
                ms_per_step_samples=[round(s, 3) for s in samples[v]],
                mpix_s=round(mpix, 3),
            )
            print(f"  MEDIAN {v[0]:10s} {v[1]:8s} {med:8.2f} ms/step  "
                  f"{mpix:7.2f} Mpix/s", flush=True)

    base = results[("heavy", "scatter", "dense")]["ms_per_step_median"]
    best = min(
        (k for k in results if k[0] == "heavy"),
        key=lambda k: results[k]["ms_per_step_median"],
    )
    print(f"\nheavy-step best: {best[1]}/{best[2]} at "
          f"{results[best]['ms_per_step_median']:.2f} ms "
          f"({base - results[best]['ms_per_step_median']:+.2f} ms vs "
          f"scatter/dense)")
    if args.out:
        payload = {
            "methodology": "chained iters; all variants precompiled; "
                           f"{args.reps} reps after 1 discarded, order "
                           "shuffled per rep; median reported",
            "iters_per_sample": args.iters,
            "table": {f"{k[0]}/{k[1]}/{k[2]}": v for k, v in results.items()},
        }
        with open(args.out, "w") as fh:
            json.dump(payload, fh, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
