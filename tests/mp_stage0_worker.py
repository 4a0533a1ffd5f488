"""Worker for the real multi-process test (tests/test_multiprocess.py).

Each process joins a 2-process jax.distributed CPU cluster, builds the SAME
deterministic scene, runs sharded stage-0 steps over the global 2-device
mesh, and process 0 writes the losses to a result file.

Run (per process): python tests/mp_stage0_worker.py <pid> <nproc> <port> <out>
"""

import sys


def main():
    pid, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from opengaussian_tpu.parallel.distributed import init_distributed

    ok = init_distributed(
        coordinator=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert ok, "multi-process init failed"
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == nproc  # one cpu device per process

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from opengaussian_tpu.cameras import Camera
    from opengaussian_tpu.config import OptimizationConfig
    from opengaussian_tpu.models import gaussians as G
    from opengaussian_tpu.models import optimizer as opt_mod
    from opengaussian_tpu.ops.rasterize import RasterizeConfig
    from opengaussian_tpu.parallel.mesh import make_mesh, shard_gaussians
    from opengaussian_tpu.parallel.steps import make_sharded_steps

    rng = np.random.default_rng(0)
    n = 256
    pts = np.stack(
        [rng.normal(0, 0.5, n), rng.normal(0, 0.4, n), rng.uniform(2, 5, n)],
        -1,
    ).astype(np.float32)
    cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    state = G.create_from_pcd(pts, cols, capacity=n, seed=0)
    state = dataclasses.replace(
        state, logit_opacity=jnp.full((n,), 1.0)
    )
    cam = Camera.from_fov(np.eye(3), np.zeros(3), 1.0, 0.8, 64, 48)
    gt = jnp.asarray(rng.uniform(0, 1, (48, 64, 3)).astype(np.float32))
    rcfg = RasterizeConfig(max_per_tile=128, chunk=32, min_intersections=8192)

    mesh = make_mesh(nproc)  # spans BOTH processes' devices
    state = shard_gaussians(mesh, state)
    adam = opt_mod.init(state.params())
    adam = opt_mod.AdamState(
        mu=shard_gaussians(mesh, adam.mu),
        nu=shard_gaussians(mesh, adam.nu),
        count=adam.count,
    )
    stats = shard_gaussians(mesh, G.DensifyStats.zeros(n))
    steps = make_sharded_steps(mesh, rcfg, OptimizationConfig(), 1.0)

    losses = []
    for i in range(3):
        state, adam, stats, loss, _aux = steps.stage0(
            state, adam, stats, cam, gt, None, jnp.int32(i + 1), jnp.zeros(3)
        )
        # fully-replicated scalar: identical on every process
        losses.append(float(loss))

    # the refiner's multi-host gather path (train/loop.py refine_sam_masks):
    # allgather the globally-sharded state to every host, commit it to a
    # LOCAL device, and run one refiner sweep on it — device_put onto
    # jax.devices()[0] would fail here on process 1 (non-addressable)
    from jax.experimental import multihost_utils

    from opengaussian_tpu.refine.sam_refiner import splat_id_votes

    gathered = multihost_utils.process_allgather(state, tiled=True)
    gathered = jax.device_put(gathered, jax.local_devices()[0])
    assert gathered.means.shape == (n, 3), gathered.means.shape
    sam = jnp.asarray((rng.integers(0, 4, (48, 64))).astype(np.int32))
    votes, vis = splat_id_votes(
        gathered, cam, sam, jnp.full((48, 64), 3.0), 4, rcfg
    )
    refiner_sum = float(jnp.sum(votes))
    assert np.isfinite(refiner_sum)

    if pid == 0:
        with open(out_path, "w") as f:
            f.write(",".join(f"{l:.8f}" for l in losses))
    print(f"worker {pid} done: {losses} refiner_votes={refiner_sum:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
