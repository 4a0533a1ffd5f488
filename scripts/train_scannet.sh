#!/bin/bash
# Counterpart of the reference's scripts/train_scannet.sh: the 10 ScanNet
# scenes, half resolution, frozen init points, optional resume from a 30k
# 3DGS checkpoint (reference train_scannet.sh:20-48 — this loader also
# accepts the reference's own chkpnt30000.pth artifacts).
#
#   ./scripts/train_scannet.sh /data/scannet [out_dir] [checkpoint_dir]
set -e
DATA=${1:?usage: train_scannet.sh <scannet_root> [out_dir] [checkpoint_dir]}
OUT=${2:-output}
CKPT_DIR=${3:-}

SCANS=(scene0000_00 scene0062_00 scene0070_00 scene0097_00 scene0140_00 \
       scene0200_00 scene0347_00 scene0400_00 scene0590_00 scene0645_00)

for scan in "${SCANS[@]}"; do
    echo "Training for ${scan} ....."
    EXTRA=()
    if [ -n "${CKPT_DIR}" ] && [ -f "${CKPT_DIR}/${scan}/chkpnt30000.pth" ]; then
        EXTRA+=(--start_checkpoint "${CKPT_DIR}/${scan}/chkpnt30000.pth")
    fi
    python -m opengaussian_tpu.cli.train \
        -s "${DATA}/${scan}" \
        -m "${OUT}/${scan}" \
        --preset scannet/default \
        -r 2 \
        --test_iterations 30000 \
        --eval \
        --enable_multiview_sam_refinement \
        "${EXTRA[@]}"
done
