"""Modeled 1 -> N chip scaling projection (VERDICT r4 item 6).

No multi-chip hardware exists in this environment, so this combines the
three measurements that DO exist into a predicted efficiency table:

  * measured single-chip phase times (tools/phase_bench.py prefix ablations,
    README roofline table — heavy workload, sorted_mxu/dense defaults);
  * the real v5e backend's collective schedule for the sharded step
    (tools/topology_probe.py -> SCALING_r04.json: per-collective bytes,
    sync/async classification, at bench capacity 262144);
  * v5e ICI bandwidth bounds (public spec: 1600 Gbps per chip aggregate
    interconnect = 200 GB/s; we model ring collectives at an effective
    160 GB/s bidirectional to absorb protocol overhead — the `--ici`
    flag overrides).

Phase scaling model (parallel/render.py design):
  projection              t/D   (device owns N/D splats)
  binning                 per --binning:
        replicated: t      (each device bins the FULL gathered table —
                            the pre-r5 design, kept for comparison)
        banded: t/D * (1+ovl) (IMPLEMENTED, r5: band-clipped expansion —
                            projection.clip_rect_rows +
                            band_intersection_budget; each device
                            expands/sorts only slots in its own tile rows;
                            ovl = cross-band rect overlap fraction)
  fwd blend               t/D   (device blends its own tile rows)
  assembly + loss         t/D
  backward replay         t/D
  grad reduce (extra)     t/D   (windowed MXU reduce over own band's slots)
  collectives             bytes * (D-1)/D / ICI   (all SYNC per the probe:
                          the forward table all-gather gates binning, the
                          grad all-reduce gates Adam — SCALING_r04
                          grad_overlap_probe findings)

Two-host rows assume a v5e pod slice (multi-host v5e stays on ICI inside
a pod, so the only change at 2x4 hosts is D; DCN never enters below 256
chips).

Usage: python tools/scaling_model.py [--binning replicated|banded|both]
Prints the table and a JSON block for SCALING_r05.json.
"""

from __future__ import annotations

import argparse
import json
import os

# Measured phase times, ms — heavy workload (52.6 ms step, sorted_mxu/dense,
# BENCH_r04/SCALING_r04 regime), from the README roofline table's
# prefix-ablation deltas (tools/phase_bench.py --heavy). "binding" notes the
# measured blocker class, which decides how the phase scales.
PHASES_MS = {
    "projection": 0.1,          # elementwise, hides under dispatch
    "binning_expand": 1.8,
    "binning_pack_gather": 3.8,
    "binning_sort": 4.6,
    "binning_carry_gather": 2.5,
    "binning_searchsorted": 1.7,
    "fwd_blend": 15.9,
    "assembly_loss": 0.33,
    "backward": 20.4,           # replay + reduction + VJPs
}
BINNING = ("binning_expand", "binning_pack_gather", "binning_sort",
           "binning_carry_gather", "binning_searchsorted")

# Sync collective bytes per step at bench capacity (262144), from the real
# v5e 2x4 backend schedule (SCALING_r04.json grad_overlap_probe). The
# all-reduce moves 2*(D-1)/D * bytes on the wire (ring), the all-gather
# (D-1)/D * bytes.
def collective_bytes(repo_root):
    with open(os.path.join(repo_root, "SCALING_r04.json")) as f:
        probe = json.load(f)["grad_overlap_probe"]["at_cap_262144"]
    ag = sum(s["bytes"] for s in probe["sync"] if s["kind"] == "all-gather")
    ar = sum(s["bytes"] for s in probe["sync"] if s["kind"] == "all-reduce")
    return ag, ar


def model(D, ag_bytes, ar_bytes, ici_gbs, binning_mode, overlap=0.3):
    t = 0.0
    for k, v in PHASES_MS.items():
        if k in BINNING:
            if binning_mode == "replicated":
                t += v
            else:  # banded
                t += v * (1.0 + overlap) / D
        else:
            t += v / D
    if D > 1:
        wire = (ag_bytes + 2 * ar_bytes) * (D - 1) / D
        t += wire / (ici_gbs * 1e9) * 1e3
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binning", default="both",
                    choices=("replicated", "banded", "both"))
    ap.add_argument("--ici", type=float, default=160.0,
                    help="effective per-chip ICI GB/s for ring collectives")
    ap.add_argument("--overlap", type=float, default=0.3,
                    help="banded-mode cross-band rect overlap fraction")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ag, ar = collective_bytes(root)
    t1 = sum(PHASES_MS.values())
    mpix = 1296 * 968 / 1e6

    modes = (["replicated", "banded"] if args.binning == "both"
             else [args.binning])
    rows = []
    for mode in modes:
        for D, label in ((1, "1 chip"), (4, "4 chips (1 host)"),
                         (8, "8 chips (2x4, 2 hosts)"),
                         (16, "16 chips (4 hosts)")):
            t = model(D, ag, ar, args.ici, mode, args.overlap)
            rows.append(dict(
                binning=mode, devices=D, label=label,
                step_ms=round(t, 2),
                mpix_s=round(mpix / t * 1e3, 1),
                speedup=round(t1 / t, 2),
                efficiency=round(t1 / t / D, 3),
            ))

    print(f"single-chip step {t1:.1f} ms (heavy, measured); "
          f"sync collectives AG {ag/1e6:.2f} MB + AR {ar/1e6:.2f} MB "
          f"(real v5e schedule); ICI {args.ici:.0f} GB/s effective")
    print(f"{'binning':11s} {'devices':>7s} {'step ms':>8s} {'Mpix/s':>8s} "
          f"{'speedup':>8s} {'eff':>6s}")
    for r in rows:
        print(f"{r['binning']:11s} {r['devices']:>7d} {r['step_ms']:>8.2f} "
              f"{r['mpix_s']:>8.1f} {r['speedup']:>8.2f} "
              f"{r['efficiency']:>6.3f}")

    result = dict(
        method="measured single-chip phase times (phase_bench prefix "
               "ablations) + real-v5e-schedule collective bytes "
               "(topology_probe) + ring-collective ICI bound",
        assumptions=dict(
            ici_effective_gbs=args.ici,
            banded_overlap_frac=args.overlap,
            phases_ms=PHASES_MS,
            collective_model="sync AG (D-1)/D + sync AR 2(D-1)/D wire "
                             "bytes; all collectives sync per the probe",
            workload="heavy (1296x968, 200k splats, ~650k live slots)",
        ),
        table=rows,
    )
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")
    else:
        print(json.dumps(result))


if __name__ == "__main__":
    main()
