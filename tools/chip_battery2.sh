#!/bin/bash
# TPU chip window battery #2 (run when training releases the chip).
# Logs to runs/chip2/.  Order: cheapest/highest-signal first.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/chip2
L=runs/chip2

echo "=== 1. bench (regression check after f16/bf16 state + lazy caps) ==="
timeout 2400 python bench.py 2>$L/bench.stderr | tee $L/bench.json
tail -30 $L/bench.stderr

echo "=== 2. bench: pose_cap=32 ablation (Cholesky 384^2 -> 192^2) ==="
timeout 2400 python bench.py --pose_cap 32 --depth_cap 32 \
    2>$L/bench_p32.stderr | tee $L/bench_p32.json
tail -8 $L/bench_p32.stderr

echo "=== 3. bench: chunk=40 dispatch amortization ==="
timeout 2400 python bench.py --chunk 40 2>$L/bench_c40.stderr \
    | tee $L/bench_c40.json

echo "=== 4. profiler trace of the streaming chunk program ==="
timeout 1800 python tools/profile_chunk.py --logdir runs/chip2/trace \
    2>&1 | tee $L/profile.log

echo "=== 5. backend scale: 512 keyframes @ 384x512 ==="
timeout 3000 python tools/validate_backend_scale.py --n_kf 512 2>&1 \
    | tee $L/backend_512.log

echo "=== 6. backend scale: 1000 keyframes @ 384x512 ==="
timeout 3600 python tools/validate_backend_scale.py --n_kf 1000 --steps 4 \
    2>&1 | tee $L/backend_1000.log

echo "=== 7. on-chip eval of the shipped weights (held-out scenes) ==="
timeout 3600 python evaluation_scripts/eval_synthetic.py \
    --ckpt weights/droid_synth.npz --seeds 11 12 13 14 15 16 17 18 \
    --motion 0.12 --size 96 128 \
    --compare 2>&1 | tee $L/eval_onchip.log | grep -aE "^seed|median|ratio"

echo "=== 8. distributed-BA scaling table (compact path, virtual mesh) ==="
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    timeout 1800 python tools/bench_scaling.py --frames 128 --compact \
    2>&1 | tee $L/scaling_compact.log

echo "battery2 done"
