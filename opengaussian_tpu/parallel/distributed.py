"""Multi-host initialization + mesh-scaling benchmark harness.

The reference is strictly single-GPU (SURVEY.md §2.3); the north-star for
this rebuild is 1 chip -> 1 host -> N hosts scaling (BASELINE.md:25-29).
This module provides the two missing pieces around parallel/mesh.py:

  * `init_distributed()` — `jax.distributed.initialize` from the standard
    env (TPU pods auto-discover; explicit coordinator envs for DCN), safe to
    call unconditionally: single-process runs are a no-op;
  * `scaling_bench(...)` — times the full sharded stage-0 train step
    (parallel/steps.py) over growing sub-meshes of the available devices and
    reports Mpix/s + parallel efficiency per mesh size. Runnable on real
    chips or on the virtual CPU mesh
    (XLA_FLAGS=--xla_force_host_platform_device_count=N) as
    `python -m opengaussian_tpu.parallel.distributed --sizes 1 2 4 8`.
"""

from __future__ import annotations

import os
import time


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed for multi-host meshes.

    Args follow `jax.distributed.initialize`; with no args, TPU pod runtimes
    auto-discover peers and single-process environments skip initialization.
    Returns True when a multi-process runtime was initialized.
    """
    import jax

    n = num_processes
    if n is None:
        n = int(os.environ.get("OPENGS_NUM_PROCESSES", "0")) or None
    if coordinator is None:
        coordinator = os.environ.get("OPENGS_COORDINATOR") or None
    if n in (None, 1) and coordinator is None and not _on_tpu_pod():
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=n,
            process_id=process_id
            if process_id is not None
            else int(os.environ.get("OPENGS_PROCESS_ID", "0")),
        )
    except RuntimeError as e:
        # backend already initialized (interactive/test session) or a
        # malformed pod env: stay single-process rather than crash
        print(f"[distributed] init skipped: {e}", flush=True)
        return False
    return jax.process_count() > 1


def _on_tpu_pod() -> bool:
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    # some environments export a warning string instead of hostnames
    valid = hosts and "," in hosts and " " not in hosts.strip()
    return bool(valid or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))


def scaling_bench(sizes=None, width: int = 648, height: int = 484,
                  n_gauss: int = 100_000, iters: int = 10, seed: int = 0):
    """-> list of dicts {devices, ms_per_step, mpix_s, efficiency}."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from opengaussian_tpu.cameras import Camera
    from opengaussian_tpu.config import OptimizationConfig
    from opengaussian_tpu.models import gaussians as G
    from opengaussian_tpu.models import optimizer as opt_mod
    from opengaussian_tpu.ops import budget
    from opengaussian_tpu.ops.rasterize import RasterizeConfig
    from opengaussian_tpu.parallel.mesh import make_mesh, shard_gaussians
    from opengaussian_tpu.parallel.steps import make_sharded_steps

    ndev = jax.device_count()
    sizes = [s for s in (sizes or [1, 2, 4, 8]) if s <= ndev]
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.normal(0, 1.2, n_gauss), rng.normal(0, 0.9, n_gauss),
         rng.uniform(2.0, 10.0, n_gauss)], -1
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (n_gauss, 3)).astype(np.float32)
    base_state = G.create_from_pcd(pts, cols, capacity=n_gauss, seed=seed)
    base_state = dataclasses.replace(
        base_state,
        log_scales=base_state.log_scales + np.log(0.15),
        logit_opacity=jnp.asarray(
            rng.normal(0.0, 2.0, n_gauss).astype(np.float32)),
    )
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 1.1, 0.9, width, height)
    rcfg = budget.tuned_config(
        RasterizeConfig(max_per_tile=1024, chunk=64), base_state, [cam]
    )
    gt = jnp.asarray(rng.uniform(0, 1, (height, width, 3)).astype(np.float32))
    ocfg = OptimizationConfig()

    results = []
    base_ms = None
    for nd in sizes:
        mesh = make_mesh(nd)
        state = shard_gaussians(mesh, base_state)
        adam = opt_mod.init(base_state.params())
        adam = opt_mod.AdamState(
            mu=shard_gaussians(mesh, adam.mu),
            nu=shard_gaussians(mesh, adam.nu), count=adam.count,
        )
        stats = shard_gaussians(mesh, G.DensifyStats.zeros(n_gauss))
        steps = make_sharded_steps(mesh, rcfg, ocfg, 1.0)
        out = steps.stage0(state, adam, stats, cam, gt, None, jnp.int32(1),
                           jnp.zeros(3))
        jax.block_until_ready(out[3])
        t0 = time.perf_counter()
        s, a, st = out[0], out[1], out[2]
        for i in range(iters):
            s, a, st, loss, _aux = steps.stage0(
                s, a, st, cam, gt, None, jnp.int32(i + 2), jnp.zeros(3)
            )
        jax.block_until_ready(loss)
        ms = (time.perf_counter() - t0) / iters * 1000
        if base_ms is None:
            base_ms = ms
        results.append(dict(
            devices=nd,
            ms_per_step=round(ms, 2),
            mpix_s=round(width * height / ms / 1e3, 2),
            efficiency=round(base_ms / ms / (nd / sizes[0]), 3),
        ))
    return results


def main(argv=None):
    import argparse
    import json

    p = argparse.ArgumentParser(description="mesh-scaling benchmark")
    p.add_argument("--sizes", nargs="+", type=int, default=[1, 2, 4, 8])
    p.add_argument("--width", type=int, default=648)
    p.add_argument("--height", type=int, default=484)
    p.add_argument("--n_gauss", type=int, default=100_000)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)
    init_distributed()
    for row in scaling_bench(args.sizes, args.width, args.height,
                             args.n_gauss, args.iters):
        print(json.dumps(row))


if __name__ == "__main__":
    main()
