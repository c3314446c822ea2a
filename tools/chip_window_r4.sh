#!/bin/bash
# Round-4 mid-round chip window: bench (prewarm + batched fnet), roofline
# table, full-preset TUM protocol run.  Strictly serialized — one chip
# client at a time (see memory: chip-discipline).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r4

echo "=== [1/3] bench.py ==="
JAX_PLATFORMS= timeout 2400 python bench.py > runs/r4/bench_1.json 2> runs/r4/bench_1.log
tail -1 runs/r4/bench_1.json || true

echo "=== [2/3] roofline ==="
JAX_PLATFORMS= timeout 2400 python tools/roofline.py --k 6 --batch 20 \
    > runs/r4/roofline.json 2> runs/r4/roofline.log || true
grep '"kernel"' runs/r4/roofline.json || true

echo "=== [3/3] TUM full preset ==="
JAX_PLATFORMS= timeout 3600 python evaluation_scripts/test_tum.py \
    --datapath /root/tum_synth --weights weights/droid_synth.npz \
    > runs/r4/tum_preset.log 2>&1 || true
tail -5 runs/r4/tum_preset.log
