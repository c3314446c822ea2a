#!/bin/bash
# Round-4 training: warm-start from the shipped npz (round-2's 105k-step
# run; the orbax state was lost to the gitignored checkpoints/ dir), or
# resume the newest completed r4 checkpoint if one exists.
#
# Durability (VERDICT r3 #2): export + commit the npz periodically with
#   python tools/export_weights.py checkpoints/r4_main/step_XXXXXX \
#       --out weights/droid_synth.npz
set -eu
cd "$(dirname "$0")/.."

ARGS=(--synthetic --steps 200000 --iters 15 --n_frames 7
      --image_size 96 128 --batch 3 --ckpt_every 2500
      --name r4_main --ckpt_dir checkpoints/r4_main)

CKPT=$(ls -d checkpoints/r4_main/step_?????? 2>/dev/null | sort | tail -1 || true)
if [ -n "${CKPT:-}" ]; then
    echo "resuming from $CKPT"
    exec python train.py "${ARGS[@]}" --lr 1e-4 --ckpt "$CKPT"
fi

STEP=$(python -c "import json; print(json.load(open('weights/droid_synth.json'))['step'])")
echo "warm-starting from weights/droid_synth.npz (step $STEP, fresh optimizer)"
exec python train.py "${ARGS[@]}" --lr 1e-4 \
    --init_npz weights/droid_synth.npz --start_step "$STEP"
