#!/bin/bash
# Round-5 second chip window (VERDICT r4 item 3): stereo and RGB-D at
# protocol scale on the chip — the two pipeline surfaces never exercised
# beyond 64x96 CPU tests.  Strictly serialized after window A
# (tools/chip_window_r5.sh); one chip client at a time.
#
#   [1] EuRoC stereo protocol: rectified 320x512 stereo pairs, stride-2
#       tracking / stride-1 fill, x1.10 scaling, no scale correction
#       -> runs/r5/euroc_stereo.log
#   [2] EuRoC mono on the same sequence (protocol stride/scale, Sim3 ATE)
#       -> runs/r5/euroc_mono.log
#   [3] ETH3D RGB-D protocol: depth prior alpha=0.05, metric SE3 ATE
#       -> runs/r5/eth3d_rgbd.log
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/r5

probe() {
    timeout 90 python -c 'import jax; assert len(jax.devices())>=1' \
        >/dev/null 2>&1
}
if ! probe; then
    echo "relay down at window B start; waiting up to 2h"
    deadline=$(( $(date +%s) + 7200 ))
    while [ "$(date +%s)" -lt "$deadline" ]; do
        sleep 120; probe && break
    done
    probe || { echo "relay never came up"; exit 3; }
fi
sleep 90

echo "=== [1/3] EuRoC stereo (320x512, buffer 192) ==="
JAX_PLATFORMS= timeout 5400 python evaluation_scripts/test_euroc.py \
    --datapath /tmp/euroc_synth --gt /tmp/euroc_synth/groundtruth.txt \
    --weights weights/droid_synth.npz --stereo --buffer 192 \
    > runs/r5/euroc_stereo.log 2>&1 || true
tail -3 runs/r5/euroc_stereo.log
sleep 90

echo "=== [2/3] EuRoC mono ==="
JAX_PLATFORMS= timeout 4800 python evaluation_scripts/test_euroc.py \
    --datapath /tmp/euroc_synth --gt /tmp/euroc_synth/groundtruth.txt \
    --weights weights/droid_synth.npz --buffer 192 \
    > runs/r5/euroc_mono.log 2>&1 || true
tail -3 runs/r5/euroc_mono.log
sleep 90

echo "=== [3/3] ETH3D RGB-D (480x736, buffer 256) ==="
JAX_PLATFORMS= timeout 5400 python evaluation_scripts/test_eth3d.py \
    --datapath /tmp/eth3d_synth --weights weights/droid_synth.npz \
    --buffer 256 \
    > runs/r5/eth3d_rgbd.log 2>&1 || true
tail -3 runs/r5/eth3d_rgbd.log
echo "=== window B done at $(date -Is) ==="
