#!/bin/bash
# Evaluate mono/stereo SLAM on the EuRoC MAV sequences
# (reference tools/evaluate_euroc.sh analog).
# Usage: ./tools/evaluate_euroc.sh <EUROC_ROOT> <GT_DIR> [--stereo] [weights]
set -e
EUROC_ROOT=${1:?usage: evaluate_euroc.sh <EUROC_ROOT> <GT_DIR> [--stereo]}
GT_DIR=${2:?}
shift 2

for seq in MH_01_easy MH_02_easy MH_03_medium MH_04_difficult \
           MH_05_difficult V1_01_easy V1_02_medium V1_03_difficult \
           V2_01_easy V2_02_medium V2_03_difficult; do
    python evaluation_scripts/test_euroc.py \
        --datapath "$EUROC_ROOT/$seq" --gt "$GT_DIR/$seq.txt" "$@"
done
