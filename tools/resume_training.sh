#!/bin/bash
# Resume the round-2 synthetic training run from the latest checkpoint.
# Run when the TPU tunnel is alive and free.
set -eu
cd "$(dirname "$0")/.."
# only COMPLETED checkpoints: an interrupted save leaves an orbax
# step_XXXXXX.orbax-checkpoint-tmp-<n> dir that sorts after them
CKPT=$(ls -d checkpoints/r2_main4/step_?????? 2>/dev/null | sort | tail -1)
echo "resuming from $CKPT"
exec python train.py --synthetic --steps 200000 --iters 15 --n_frames 7 \
    --image_size 96 128 --batch 3 --lr 1.5e-4 --ckpt_every 2500 \
    --name r2_main4 --ckpt_dir checkpoints/r2_main4 --ckpt "$CKPT"
