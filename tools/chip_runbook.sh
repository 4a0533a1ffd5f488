#!/bin/bash
# On-chip validation runbook (run when the axon TPU tunnel is available):
#   parity gates -> backward-variant 2x2 A/B -> phase trace -> bench.
# Run detached (outlives the shell):
#   setsid nohup bash tools/chip_runbook.sh > /tmp/chip_runbook.log 2>&1 &
# After a winning A/B: flip REDUCE_BACKEND / BWD_LAYOUT defaults in
# ops/rasterize_pallas.py, re-run steps 3-4, update the README perf table.
set -x
cd "$(dirname "$0")/.."
date -u
timeout 300 python -c "import jax; print(jax.devices())" || exit 1
echo "=== 1. kernel parity (default; caches the XLA ref on first run) ==="
timeout 1200 python tools/chip_parity.py
timeout 1200 python tools/chip_parity.py
echo "=== 1b. variant parities ==="
timeout 1200 python tools/chip_parity.py --reduce sorted_mxu
timeout 1200 python tools/chip_parity.py --layout compact
timeout 1200 python tools/chip_parity.py --reduce sorted_mxu --layout compact
echo "=== 2. 2x2 A/B (reduce_backend x bwd_layout, parity-gated) ==="
timeout 3000 python tools/ab_reduce.py --iters 20
echo "=== 3. phase trace (heavy, default path) ==="
timeout 1200 python tools/trace_step.py --heavy
echo "=== 4. bench (incl. its own guarded variant A/B) ==="
timeout 3600 python bench.py
echo "=== 5. quality-parity artifact (five-stage run -> QUALITY_r04.json) ==="
timeout 3600 python tools/quality_run.py
date -u
echo "RUNBOOK DONE"
