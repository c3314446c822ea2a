#!/bin/bash
# Validate on the TartanAir test split
# (reference tools/validate_tartanair.sh analog).
# Usage: ./tools/validate_tartanair.sh <TARTANAIR_ROOT> [weights]
set -e
ROOT=${1:?usage: validate_tartanair.sh <TARTANAIR_ROOT> [weights]}
WEIGHTS=${2:+--weights $2}

while read -r scene; do
    python evaluation_scripts/validate_tartanair.py \
        --datapath "$ROOT/$scene" $WEIGHTS
done < <(python -c "
from droid_slam_tpu.data.tartan import TEST_SPLIT
print('\n'.join(TEST_SPLIT))")
