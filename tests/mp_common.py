"""Shared scenario for the real multi-process tests (VERDICT r3 item 4).

`run_sequence(ckpt_path)` runs the SAME deterministic scene over a 2-device
mesh — which spans two processes in the worker, or two local devices in the
in-process parity twin — through every multi-host-critical path:

  * 3 sharded stage-0 steps (the original coverage),
  * 1 sharded stage-1 step (mask cohesion/separation losses),
  * one mesh-sharded pseudo sweep (parallel/sweeps.make_sweep_fns sweep1),
  * the FULL SAM refinement with the mesh-sharded refiner twins
    (parallel/refine.py — the host graph-merge runs redundantly per
    process on the replicated outputs),
  * a checkpoint save (collective gathers, process-0 write, barrier) +
    load + re-shard + one more stage-0 step.

Returns the scalar fingerprints in a fixed order; the test asserts the
2-process run matches the single-process run to float tolerance.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def run_sequence(ckpt_path: str) -> list[float]:
    import jax
    import jax.numpy as jnp

    from opengaussian_tpu.cameras import Camera
    from opengaussian_tpu.config import OptimizationConfig
    from opengaussian_tpu.models import gaussians as G
    from opengaussian_tpu.models import optimizer as opt_mod
    from opengaussian_tpu.ops.rasterize import RasterizeConfig
    from opengaussian_tpu.parallel.mesh import make_mesh, shard_gaussians
    from opengaussian_tpu.parallel.refine import make_refiner_fns
    from opengaussian_tpu.parallel.steps import make_sharded_steps
    from opengaussian_tpu.parallel.sweeps import make_sweep_fns
    from opengaussian_tpu.refine.sam_refiner import refine_sam_masks
    from opengaussian_tpu.train import checkpoint as ckpt

    rng = np.random.default_rng(0)
    n = 256
    pts = np.stack(
        [rng.normal(0, 0.5, n), rng.normal(0, 0.4, n), rng.uniform(2, 5, n)],
        -1,
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, capacity=n, seed=0)
    state = dataclasses.replace(state, logit_opacity=jnp.full((n,), 1.0))
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 1.0, 0.8, 64, 48)
    gt = jnp.asarray(rng.uniform(0, 1, (48, 64, 3)).astype(np.float32))
    sam = jnp.asarray(rng.integers(0, 4, (48, 64)).astype(np.int32))
    rcfg = RasterizeConfig(max_per_tile=128, chunk=32, min_intersections=8192)
    bg = jnp.zeros(3)

    def shard_all(state, adam, stats):
        state = shard_gaussians(mesh, state)
        adam = opt_mod.AdamState(
            mu=shard_gaussians(mesh, adam.mu),
            nu=shard_gaussians(mesh, adam.nu),
            count=adam.count,
        )
        stats = shard_gaussians(mesh, stats)
        return state, adam, stats

    mesh = make_mesh(2)
    state, adam, stats = shard_all(
        state, opt_mod.init(state.params()), G.DensifyStats.zeros(n)
    )
    steps = make_sharded_steps(mesh, rcfg, OptimizationConfig(), 1.0)

    out = []
    for i in range(3):
        state, adam, stats, loss, _aux = steps.stage0(
            state, adam, stats, cam, gt, None, jnp.int32(i + 1), jnp.zeros(3)
        )
        out.append(float(loss))  # fully replicated: identical per process

    # sharded stage-1 step
    state, adam, loss1, _ = steps.stage1(
        state, adam, cam, sam, None, jnp.int32(5), bg, jnp.float32(1.0),
        max_masks=8,
    )
    out.append(float(loss1))

    # mesh-sharded pseudo sweep 1 (stage boundary)
    fns = make_sweep_fns(mesh, rcfg, k1=2, k2=2, max_masks=8)
    pf, pids = fns.sweep1(state, cam, sam, bg)
    out.append(float(jnp.sum(pf)) + float(jnp.sum(pids)))

    # full SAM refinement through the sharded twins; host graph-merge runs
    # on every process from the replicated outputs
    rfns = make_refiner_fns(mesh, rcfg)
    refined = refine_sam_masks(
        state, [cam], np.asarray(sam)[None], rcfg, anchor_stride=1,
        sharded_fns=rfns,
    )
    out.append(float(refined.sum()))

    # checkpoint round-trip across processes: collective gather + proc-0
    # write + barrier, then every process loads, re-shards, and steps
    ckpt.save(ckpt_path, state, adam, stats, None, 6)
    state2, adam2, stats2, _km, it = ckpt.load(ckpt_path)
    assert it == 6
    state2, adam2, stats2 = shard_all(state2, adam2, stats2)
    state2, adam2, stats2, loss_post, _aux = steps.stage0(
        state2, adam2, stats2, cam, gt, None, jnp.int32(7), jnp.zeros(3)
    )
    out.append(float(loss_post))
    return out
