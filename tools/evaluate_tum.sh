#!/bin/bash
# Evaluate monocular SLAM on the TUM-RGBD fr1 sequences
# (reference tools/evaluate_tum.sh analog).
# Usage: ./tools/evaluate_tum.sh <TUM_ROOT> [weights]
set -e
TUM_ROOT=${1:?usage: evaluate_tum.sh <TUM_ROOT> [weights]}
WEIGHTS=${2:+--weights $2}

for seq in rgbd_dataset_freiburg1_360 rgbd_dataset_freiburg1_desk \
           rgbd_dataset_freiburg1_desk2 rgbd_dataset_freiburg1_floor \
           rgbd_dataset_freiburg1_plant rgbd_dataset_freiburg1_room \
           rgbd_dataset_freiburg1_rpy rgbd_dataset_freiburg1_teddy \
           rgbd_dataset_freiburg1_xyz; do
    python evaluation_scripts/test_tum.py --datapath "$TUM_ROOT/$seq" $WEIGHTS
done
