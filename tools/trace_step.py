"""Trace one training-style fwd+bwd step and print the per-op phase table.

Promotes the round-2 /tmp profiling workflow into the repo (SURVEY.md §5.1:
tracing must be a first-class subsystem). Two pitfalls this tool encodes:

  * NEVER time kernels with fixed-input timeit loops on the axon tunnel —
    repeated executions with identical args are memoized (an 850k-element
    sort "measures" 0.04 ms). This traces a jitted step with
    ``jax.profiler.trace`` and reads per-op durations from the device track.
  * The XLA cost model's ``estimated_cycles`` in compiled HLO also misleads
    (it reported 5 ms for fusions that trace at 1.75 ms); only the trace
    counts.

Usage:
    python tools/trace_step.py              # calibrated workload (bench.py)
    python tools/trace_step.py --heavy      # r1-heavy ~650k-intersection load
    python tools/trace_step.py --backend xla --top 25

Prints: total device time per step, then the top ops (mean ms/step, share),
bucketed into coarse phases (projection/binning fusions, sort, pallas fwd,
pallas bwd, scatter/reduction, other).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(trace_dir: str):
    """-> list of (op_name, total_us) aggregated over the newest trace file's
    device track(s)."""
    files = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # metadata: process/thread names identify the device tracks
    pid_name = {}
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def on_device(e):
        pn = pid_name.get(e.get("pid"), "")
        tn = tid_name.get((e.get("pid"), e.get("tid")), "")
        hay = (pn + " " + tn).lower()
        return ("tpu" in hay or "device" in hay) and "host" not in hay

    def on_xla_host(e):
        # CPU-backend fallback: XLA client threads on the /host track
        tn = tid_name.get((e.get("pid"), e.get("tid")), "")
        return "xla" in tn.lower()

    for pred in (on_device, on_xla_host):
        agg = defaultdict(float)
        for e in events:
            if e.get("ph") == "X" and e.get("dur") and pred(e):
                agg[e["name"]] += e["dur"]
        if agg:
            return sorted(agg.items(), key=lambda kv: -kv[1])
    return []


PHASES = [
    ("pallas-bwd", ("bwd", "custom-call")),
    ("pallas-fwd", ("fwd", "custom-call")),
    ("sort", ("sort",)),
    ("scatter/reduce", ("scatter",)),
    ("gather/copy", ("gather", "dynamic-slice", "copy", "concatenate")),
    ("fusion (binning/proj/elementwise)", ("fusion", "reduce")),
]


def phase_of(name: str) -> str:
    low = name.lower()
    for phase, keys in PHASES:
        if all(k in low for k in keys):
            return phase
    for phase, keys in PHASES[2:]:
        if any(k in low for k in keys):
            return phase
    if "custom-call" in low or "custom_call" in low:
        return "pallas (unsplit)"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--heavy", action="store_true",
                    help="r1-heavy workload (~650k intersections)")
    ap.add_argument("--backend", default=None, choices=[None, "pallas", "xla"])
    ap.add_argument("--reduce", default=None,
                    choices=[None, "scatter", "sorted_mxu"],
                    help="override the per-splat reduction backend")
    ap.add_argument("--layout", default=None, choices=[None, "dense", "compact"],
                    help="override the backward d_slot layout")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--outdir", default="/tmp/jaxtrace")
    args = ap.parse_args()

    import dataclasses

    import jax

    import bench

    scale = 0.15 if args.heavy else 0.088
    state, cam, rcfg, gt, bg, make_fwd_bwd = bench.make_workload(
        scale, backend=args.backend
    )
    if args.reduce:
        rcfg = dataclasses.replace(rcfg, reduce_backend=args.reduce)
    if args.layout:
        rcfg = dataclasses.replace(rcfg, bwd_layout=args.layout)
    print(f"workload: scale={scale} P={rcfg.max_intersections(state.capacity)}"
          f" K={rcfg.max_per_tile} backend={rcfg.backend}"
          f" device={jax.default_backend()}", file=sys.stderr, flush=True)
    f = make_fwd_bwd(rcfg)
    out = f(state)
    jax.block_until_ready(out)

    def chain(st):
        # thread a tiny but NONZERO grad step back into the params so every
        # traced iteration presents new argument values — fixed-input loops
        # on the axon tunnel get memoized and never reach the device (the
        # pitfall the module docstring documents; same guard as ab_reduce)
        loss, grads = f(st)
        p = st.params()
        return st.with_params({k: p[k] - 1e-8 * grads[k] for k in p}), loss

    with jax.profiler.trace(args.outdir):
        st = state
        for _ in range(args.iters):
            st, loss = chain(st)
        jax.block_until_ready(loss)

    ops = parse_trace(args.outdir)
    total_us = sum(us for _, us in ops)
    step_ms = total_us / args.iters / 1000.0
    print(f"\ntotal device time: {step_ms:.2f} ms/step "
          f"({args.iters} steps traced)")

    by_phase = defaultdict(float)
    for name, us in ops:
        by_phase[phase_of(name)] += us
    print("\nphase table:")
    for phase, us in sorted(by_phase.items(), key=lambda kv: -kv[1]):
        ms = us / args.iters / 1000.0
        print(f"  {phase:38s} {ms:8.2f} ms  {us / total_us * 100:5.1f}%")

    print(f"\ntop {args.top} ops:")
    for name, us in ops[: args.top]:
        ms = us / args.iters / 1000.0
        print(f"  {name[:64]:64s} {ms:8.2f} ms  {us / total_us * 100:5.1f}%")


if __name__ == "__main__":
    main()
