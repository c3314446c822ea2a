#!/bin/bash
# Round-5 first chip window (VERDICT r4 items 1, 2, 4).  Strictly
# serialized — one chip client at a time (memory: chip-discipline).
#
#   [0] wait for the axon relay to come back (it died ~21:45 on 08-19,
#       nulling BENCH_r04), probing device enumeration in a subprocess
#   [1] bench.py  -> runs/r5/bench_1.{json,log}   (the official capture)
#   [2] bench.py AGAIN in a fresh process with compilation-cache logging
#       -> runs/r5/bench_2.{json,log}.  No code changes in between: this
#       is the cross-process persistent-cache experiment.  Success =
#       "init frame 1" seconds, not ~700 s.
#   [3] full TUM preset with the shipped 127.5k weights
#       -> runs/r5/tum_preset_127500.log
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r5

echo "=== [0/3] waiting for relay ==="
deadline=$(( $(date +%s) + 6*3600 ))
up=0
while [ "$(date +%s)" -lt "$deadline" ]; do
    if timeout 90 python -c 'import jax; assert len(jax.devices())>=1' \
        >> runs/r5/chip_wait.log 2>&1; then
        up=1; echo "relay up at $(date -Is)" | tee -a runs/r5/chip_wait.log
        break
    fi
    echo "probe failed at $(date -Is); retry in 120s" >> runs/r5/chip_wait.log
    sleep 120
done
if [ "$up" != 1 ]; then
    echo "relay never came up within 6h" | tee -a runs/r5/chip_wait.log
    exit 3
fi
# settle: the probe process's buffers free asynchronously cross-client
sleep 90

echo "=== [1/3] bench.py (official capture) ==="
JAX_PLATFORMS= timeout 2700 python bench.py \
    > runs/r5/bench_1.json 2> runs/r5/bench_1.log
tail -1 runs/r5/bench_1.json || true
sleep 90

echo "=== [2/3] bench.py again (cross-process cache experiment) ==="
JAX_PLATFORMS= JAX_DEBUG_LOG_MODULES=jax._src.compilation_cache \
    timeout 2700 python bench.py \
    > runs/r5/bench_2.json 2> runs/r5/bench_2.log
tail -1 runs/r5/bench_2.json || true
grep -c "cache hit" runs/r5/bench_2.log || true
grep "init frame 1" runs/r5/bench_2.log || true
sleep 90

echo "=== [3/3] TUM full preset, shipped 127.5k weights ==="
JAX_PLATFORMS= timeout 3600 python evaluation_scripts/test_tum.py \
    --datapath /tmp/tum_synth --weights weights/droid_synth.npz \
    > runs/r5/tum_preset_127500.log 2>&1 || true
tail -5 runs/r5/tum_preset_127500.log
echo "=== window done at $(date -Is) ==="
