"""Full SAM-refinement timing at north-star scale (VERDICT r4 item 5).

Runs refine_sam_masks at ~100k splats / 60 views / 648x484 / stride-1000
anchors and splits the wall time into device passes vs host graph-merge
phases (the `timings` accumulator in refine/sam_refiner.py). The question
the artifact answers: the device passes are sharded and probed
(parallel/refine.py, SCALING_r04) — did the sequential host merge eat the
win end-to-end?

Scene realism: splats fill a room volume; per-view SAM ids are blocky grids
whose id numbering is view-local (shifted per view), so stage-1 has real
cross-view identity work to do; ~40% of splats clear the 0.99 anchor
opacity gate, matching a trained scene's opacity histogram top end.

Usage: python tools/refine_bench.py [--splats 100000] [--views 60]
       [--ids 32] [--stride 1000]
Prints one JSON dict (phase seconds + totals) to stdout.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

WIDTH, HEIGHT = 648, 484


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=100_000)
    ap.add_argument("--views", type=int, default=60)
    ap.add_argument("--ids", type=int, default=32, help="SAM ids per view")
    ap.add_argument("--stride", type=int, default=1000)
    args = ap.parse_args()

    import jax.numpy as jnp

    from opengaussian_tpu.cameras import Camera
    from opengaussian_tpu.models.gaussians import create_from_pcd
    from opengaussian_tpu.ops.rasterize import RasterizeConfig
    from opengaussian_tpu.refine.sam_refiner import refine_sam_masks

    rng = np.random.default_rng(0)
    n = args.splats
    pts = np.stack(
        [rng.normal(0, 1.2, n), rng.normal(0, 0.9, n), rng.uniform(2.0, 9.0, n)],
        -1,
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    gs = create_from_pcd(pts, cols, capacity=n, seed=0)
    # trained-scene opacity top end: ~40% of splats >= 0.99 (anchor gate)
    op = np.where(rng.uniform(size=n) < 0.4, 6.0, rng.normal(0.0, 2.0, n))
    gs = dataclasses.replace(
        gs,
        log_scales=gs.log_scales + np.log(0.05),
        logit_opacity=jnp.asarray(op.astype(np.float32)),
    )

    cams, sams = [], []
    yy, xx = np.meshgrid(np.arange(HEIGHT), np.arange(WIDTH), indexing="ij")
    gh = max(1, int(np.sqrt(args.ids / 2)))
    gw = max(1, args.ids // gh)
    block = ((yy * gh // HEIGHT) * gw + (xx * gw // WIDTH)) % args.ids
    for v in range(args.views):
        ang = 0.9 * (v / max(args.views - 1, 1) - 0.5)
        R = np.array(
            [[np.cos(ang), 0, -np.sin(ang)], [0, 1, 0],
             [np.sin(ang), 0, np.cos(ang)]], np.float32)
        t = np.array([0.8 * np.sin(2 * ang), 0.1 * np.cos(3 * ang), 0.0],
                     np.float32)
        cams.append(Camera.from_fov(R, t, 1.1, 0.9, WIDTH, HEIGHT))
        # view-local id numbering: shift the blocky grid per view so the
        # same world region carries different local ids across views
        sam = ((block + v * 7) % args.ids + 1).astype(np.int16)
        sam[:6] = 0  # an invalid border stripe
        sams.append(sam)
    sam_ids = np.stack(sams)

    rcfg = RasterizeConfig(max_per_tile=512, chunk=64)
    timings: dict = {}

    # live phase progress: timings is mutated in place by the refiner, so a
    # daemon sampler gives per-phase visibility mid-run (the first full run
    # timed out after 58 min with zero output — the [H,W,n_gids] stage-2
    # transfers over the ~44 MB/s tunnel, since moved on-device)
    import threading

    stop = threading.Event()

    def sampler():
        while not stop.wait(30):
            print(f"# t={time.perf_counter() - t0:.0f}s "
                  + " ".join(f"{k}={v:.1f}" for k, v in sorted(timings.items())),
                  file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    threading.Thread(target=sampler, daemon=True).start()
    refined = refine_sam_masks(gs, cams, sam_ids, rcfg,
                               anchor_stride=args.stride, timings=timings)
    total = time.perf_counter() - t0
    stop.set()

    device = sum(v for k, v in timings.items() if k.startswith("device"))
    host = sum(v for k, v in timings.items() if k.startswith("host"))
    res = dict(
        workload=dict(splats=n, views=args.views, width=WIDTH, height=HEIGHT,
                      ids_per_view=args.ids, anchor_stride=args.stride),
        refined_ids=int(refined.max()),
        void_frac=round(float((refined < 0).mean()), 4),
        **{k: round(v, 2) for k, v in sorted(timings.items())},
        device_total_s=round(device, 2),
        host_total_s=round(host, 2),
        total_s=round(total, 2),
        host_frac=round(host / max(total, 1e-9), 3),
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
