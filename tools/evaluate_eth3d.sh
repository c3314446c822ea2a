#!/bin/bash
# Evaluate RGB-D SLAM on ETH3D-SLAM training sequences
# (reference tools/evaluate_eth3d.sh analog).
# Usage: ./tools/evaluate_eth3d.sh <ETH3D_ROOT> [weights]
set -e
ETH3D_ROOT=${1:?usage: evaluate_eth3d.sh <ETH3D_ROOT> [weights]}
WEIGHTS=${2:+--weights $2}

for seq in "$ETH3D_ROOT"/*/; do
    python evaluation_scripts/test_eth3d.py --datapath "$seq" $WEIGHTS
done
