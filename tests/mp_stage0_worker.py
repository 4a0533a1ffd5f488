"""Worker for the real multi-process test (tests/test_multiprocess.py).

Each process joins a 2-process jax.distributed CPU cluster and runs the
shared multi-host scenario (tests/mp_common.py): sharded stage-0 + stage-1
steps, a mesh-sharded pseudo sweep, the full SAM refinement through the
sharded refiner twins, and a checkpoint save/restore round-trip. Process 0
writes the scalar fingerprints to a result file.

Run (per process): python tests/mp_stage0_worker.py <pid> <nproc> <port> <out>
"""

import os
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

    from tests.mp_common import run_sequence

    ckpt_path = os.path.join(os.path.dirname(out_path), "mp_ckpt.npz")
    vals = run_sequence(ckpt_path)

    if pid == 0:
        with open(out_path, "w") as f:
            f.write(",".join(f"{v:.8f}" for v in vals))
    print(f"worker {pid} done: {vals}", flush=True)


if __name__ == "__main__":
    main()
