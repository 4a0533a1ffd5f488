#!/bin/bash
# Counterpart of the reference's scripts/train_lerf.sh: the four LeRF-OVS
# scenes with their per-scene recipes (reference train_lerf.sh:20-140; the
# same values live in config.py PRESETS, so each run is just a preset).
#
#   ./scripts/train_lerf.sh /data/lerf_ovs [out_dir]
#
# Stage schedule (70k total): 3DGS 0-30k, stage1 30-40k, coarse 40-50k,
# fine 50-70k. On TPU there is no CUDA_VISIBLE_DEVICES picking — use
# --mesh N to shard a run over N chips instead.
set -e
DATA=${1:?usage: train_lerf.sh <lerf_ovs_root> [out_dir]}
OUT=${2:-output}

for scan in figurines waldo_kitchen ramen teatime; do
    echo "Training for ${scan} ....."
    python -m opengaussian_tpu.cli.train \
        -s "${DATA}/${scan}" \
        -m "${OUT}/${scan}" \
        --preset "lerf/${scan}" \
        --test_iterations 30000 \
        --eval
done
