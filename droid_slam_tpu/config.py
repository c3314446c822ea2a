"""Configuration for the SLAM runtime and training.

The reference scatters hyperparameters across per-script argparse flags
(demo.py:60-83, evaluation_scripts/*.py); here they live in one dataclass
with per-dataset presets, plus the *static capacity* knobs that the
TPU runtime needs for jit-stable shapes (fixed-size edge/pose arrays with
validity masks — SURVEY.md §7 "hard parts" #1).
"""

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SLAMConfig:
    # --- geometry / buffers -------------------------------------------------
    image_size: Tuple[int, int] = (240, 320)   # input H, W (multiple of 8)
    buffer: int = 512                          # max keyframes (demo.py:67)
    stereo: bool = False
    upsample: bool = False

    # --- motion filter ------------------------------------------------------
    filter_thresh: float = 2.4                 # mean-flow keyframe gate

    # --- frontend (droid_frontend.py / demo.py defaults) --------------------
    warmup: int = 8
    keyframe_thresh: float = 4.0
    frontend_thresh: float = 16.0
    frontend_window: int = 25
    frontend_radius: int = 2
    frontend_nms: int = 1
    max_age: int = 25
    frontend_iters1: int = 4
    frontend_iters2: int = 2
    frontend_max_factors: int = 48             # FactorGraph(max_factors=48)

    # --- backend (droid_backend.py / demo.py defaults) ----------------------
    backend_thresh: float = 22.0
    backend_radius: int = 2
    backend_nms: int = 3
    beta: float = 0.3

    # --- BA solver ----------------------------------------------------------
    frontend_lm: float = 1e-4
    frontend_ep: float = 0.1
    backend_lm: float = 1e-5
    backend_ep: float = 1e-2
    ba_iters: int = 2                          # inner GN iterations per update

    # --- static capacities (TPU jit stability) ------------------------------
    # active + inactive edge capacity of the frontend factor graph
    frontend_edge_cap: int = 96
    # pose window capacity of the frontend BA (frames in [t0, t1))
    frontend_pose_cap: int = 64
    # depth-frame capacity of the frontend BA (kx = window ∪ {ii})
    frontend_depth_cap: int = 64
    # max incident edges per depth frame in the Schur gather
    schur_degree_cap: int = 32
    # trajectory filler batch (reference trajectory_filler.py:95)
    filler_batch: int = 16
    # fully-fused device-resident frontend (runtime/fused.py): one jitted
    # program + one readback per keyframe instead of the host-driven loop
    fused: bool = True
    # route the backend's global BA through the edge-sharded distributed
    # solver (parallel/dba.py) when >1 device is visible
    distributed_backend: bool = False
    # low-memory on-the-fly correlation: query pixels per volume block
    # (0 = auto: chunk only when the per-update transient would exceed
    # ~0.6 GB — the large-resolution global-BA regime)
    corr_pixel_chunk: int = 0
    # fused frontend: cache the per-edge correlation-volume pyramid across
    # the 4+2 update rounds of a keyframe step (volumes depend only on the
    # feature maps and the edge set, both fixed within the step).  Budget
    # in MB; 0 disables, volumes above the budget recompute on the fly.
    corr_cache_mb: int = 512
    # windowed-lookup implementation:
    #   "auto"      — pallas_v3 on TPU hardware, onehot elsewhere
    #   "onehot"    — weighted-selector matmuls (pure XLA, any backend)
    #   "pallas_v3" — queries-along-lanes masked-reduction kernel
    #                 (ops/corr_pallas.py): 5.0x the onehot level-0
    #                 lookup on v5e and 13.4 -> 21.5 kf/s end-to-end
    #                 (runs/r4/{roofline_v3,bench_v3}.json); TPU only
    #   "pallas"/"pallas_v2" — the earlier rotate kernels (kept for A/B)
    lookup_impl: str = "auto"

    # --- precision ----------------------------------------------------------
    compute_dtype: str = "bfloat16"            # network compute
    # ------------------------------------------------------------------------

    @property
    def feat_hw(self):
        return self.image_size[0] // 8, self.image_size[1] // 8


# Per-dataset presets mirroring the reference evaluation scripts' defaults.
PRESETS = {
    # evaluation_scripts/test_tum.py:56-73
    "tum": SLAMConfig(
        image_size=(240, 320), buffer=512, beta=0.6, filter_thresh=1.75,
        warmup=12, keyframe_thresh=2.25, frontend_thresh=12.0,
        frontend_window=25, frontend_radius=2, frontend_nms=1,
        backend_thresh=15.0, backend_radius=2, backend_nms=3,
    ),
    # evaluation_scripts/test_euroc.py:82-100
    "euroc": SLAMConfig(
        image_size=(320, 512), buffer=512, beta=0.3, filter_thresh=2.4,
        warmup=15, keyframe_thresh=3.5, frontend_thresh=17.5,
        frontend_window=20, frontend_radius=2, frontend_nms=1,
        backend_thresh=24.0, backend_radius=2, backend_nms=2,
    ),
    # evaluation_scripts/test_eth3d.py:60-80 (RGB-D)
    "eth3d": SLAMConfig(
        image_size=(240, 320), buffer=1024, beta=0.5, filter_thresh=2.0,
        warmup=8, keyframe_thresh=3.5, frontend_thresh=16.0,
        frontend_window=16, frontend_radius=1, frontend_nms=0,
        backend_thresh=22.0, backend_radius=2, backend_nms=3,
    ),
    # evaluation_scripts/validate_tartanair.py:44-62
    "tartanair": SLAMConfig(
        image_size=(384, 512), buffer=1000, beta=0.3, filter_thresh=2.4,
        warmup=12, keyframe_thresh=3.5, frontend_thresh=15.0,
        frontend_window=20, frontend_radius=1, frontend_nms=1,
        backend_thresh=20.0, backend_radius=2, backend_nms=3,
    ),
    "demo": SLAMConfig(),
}


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference train.py:144-186 defaults)."""

    lr: float = 2.5e-4
    steps: int = 250000
    batch: int = 1
    iters: int = 15                 # unrolled update steps
    clip: float = 2.5
    n_frames: int = 7
    fmin: float = 8.0
    fmax: float = 96.0
    noise: bool = False
    scale: bool = False
    edges: int = 24
    restart_prob: float = 0.2
    world_size: int = 1
    ckpt_every: int = 10000
    image_size: Tuple[int, int] = (384, 512)
    fix_scale: bool = True
    ckpt_dir: str = "checkpoints"
    name: str = "droid_tpu"
