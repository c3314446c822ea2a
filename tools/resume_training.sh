#!/bin/bash
# Resume the synthetic training run.  Run when the TPU tunnel is alive
# and free.
#
# Preference order:
#   1. the latest COMPLETED orbax checkpoint under checkpoints/r3_main/
#      (full train state: params + optimizer + step);
#   2. else warm-start from the shipped weights npz (params only, fresh
#      optimizer) — the fallback when checkpoints/ did not survive the
#      environment (it is gitignored; round-2's step_105000 was lost
#      this way).
set -eu
cd "$(dirname "$0")/.."

ARGS=(--synthetic --steps 200000 --iters 15 --n_frames 7
      --image_size 96 128 --batch 3 --ckpt_every 2500
      --name r3_main --ckpt_dir checkpoints/r3_main)

# only COMPLETED checkpoints: an interrupted save leaves an orbax
# step_XXXXXX.orbax-checkpoint-tmp-<n> dir that sorts after them
CKPT=$(ls -d checkpoints/r3_main/step_?????? 2>/dev/null | sort | tail -1 || true)
if [ -n "${CKPT:-}" ]; then
    echo "resuming from $CKPT"
    exec python train.py "${ARGS[@]}" --lr 1.5e-4 --ckpt "$CKPT"
fi

STEP=$(python -c "import json; print(json.load(open('weights/droid_synth.json'))['step'])")
echo "warm-starting from weights/droid_synth.npz (step $STEP, fresh optimizer)"
exec python train.py "${ARGS[@]}" --lr 1e-4 \
    --init_npz weights/droid_synth.npz --start_step "$STEP"
