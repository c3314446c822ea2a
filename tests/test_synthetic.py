"""Ground-truth consistency of the synthetic scene generators.

Every training/eval scene family must be photometrically consistent with
its own ground truth: warping frame j into frame i through the exact
depth and poses must reproduce frame i (up to interpolation noise and
occlusion).  This is what makes the dataset-free accuracy harness
(eval_synthetic, test_learned_tracking) meaningful — if the renderer's
GT were inconsistent, learned-tracking ATE would measure renderer bugs.
"""

import numpy as np
import pytest

from droid_slam_tpu.data.synthetic import (
    render_box_scene, render_plane_scene,
)


def _median_warp_error(scene, i=0, j=2):
    import cv2
    import jax.numpy as jnp

    from droid_slam_tpu.lie import se3, so3

    H, W = scene["depths"].shape[1:]
    fx, fy, cx, cy = scene["intrinsics"][0]
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    z = scene["depths"][i]
    pts = np.stack([(xs - cx) / fx * z, (ys - cy) / fy * z, z],
                   -1).reshape(-1, 3)
    gi, gj = scene["poses_c2w"][i], scene["poses_c2w"][j]
    pw = np.asarray(
        so3.act(jnp.asarray(gi[3:7]), jnp.asarray(pts))
    ) + gi[:3]
    gj_inv = np.asarray(se3.inv(jnp.asarray(gj)))
    pc = np.asarray(
        so3.act(jnp.asarray(gj_inv[3:7]), jnp.asarray(pw))
    ) + gj_inv[:3]
    u = (fx * pc[:, 0] / pc[:, 2] + cx).reshape(H, W)
    v = (fy * pc[:, 1] / pc[:, 2] + cy).reshape(H, W)
    warped = cv2.remap(
        scene["images"][j].astype(np.float32),
        u.astype(np.float32), v.astype(np.float32),
        cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
        borderValue=-1e4,
    )
    valid = (
        (warped[..., 0] > -5e3)
        & (u >= 0) & (u < W - 1) & (v >= 0) & (v < H - 1)
    )
    err = np.abs(
        warped - scene["images"][i].astype(np.float32)
    ).mean(-1)
    assert valid.mean() > 0.4, "warp left too few valid pixels"
    return float(np.median(err[valid]))


@pytest.mark.parametrize("name,scene_fn", [
    ("box", lambda: render_box_scene(
        4, 64, 96, seed=3, motion_scale=0.12)),
    ("box_occluders", lambda: render_box_scene(
        4, 96, 128, seed=4, motion_scale=0.16, focal=1.1, n_obstacles=3)),
    ("corridor", lambda: render_box_scene(
        4, 64, 96, seed=5, motion_scale=0.12, box=(1.0, 1.1, 9.0))),
    ("plane", lambda: render_plane_scene(
        4, 64, 96, seed=6, motion_scale=0.08)),
    ("slanted_plane", lambda: render_plane_scene(
        4, 96, 128, seed=7, motion_scale=0.10, focal=0.75, tilt=0.5)),
])
def test_scene_gt_consistency(name, scene_fn):
    scene = scene_fn()
    assert np.isfinite(scene["depths"]).all()
    assert scene["depths"].min() > 0
    assert np.isfinite(scene["poses_c2w"]).all()
    # median photometric error of the GT warp: bilinear-resampling noise
    # (larger at 64x96 where the texture is closer to Nyquist — measured
    # 8.3/7.9 grey levels for box/corridor, ~2 at 96x128); genuine GT
    # inconsistency (wrong depth/pose) produces 30-80
    med = _median_warp_error(scene)
    assert med < 15.0, (name, med)
