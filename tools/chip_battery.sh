#!/bin/bash
# One-shot TPU chip battery for the end-of-round validation window.
# Run AFTER training releases the chip; logs to runs/chip_battery/.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/chip_battery
L=runs/chip_battery

echo "=== 1. pallas on-silicon parity + timing ==="
timeout 1800 python tools/validate_pallas.py 2>&1 | tee $L/pallas.log

echo "=== 2. in-context round ablation (onehot) ==="
timeout 1800 python tools/probe_round.py 2>&1 | tee $L/probe_onehot.log

echo "=== 3. in-context round ablation (pallas) ==="
timeout 1800 python tools/probe_round.py --lookup pallas 2>&1 \
    | tee $L/probe_pallas.log

echo "=== 4. bench ==="
timeout 2400 python bench.py 2>$L/bench.stderr | tee $L/bench.json
tail -40 $L/bench.stderr

echo "=== 5. backend scale (512 keyframes @ 384x512) ==="
timeout 2400 python tools/validate_backend_scale.py 2>&1 \
    | tee $L/backend_scale.log

echo "battery done"
