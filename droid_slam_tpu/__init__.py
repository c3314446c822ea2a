"""droid_slam_tpu — a TPU-native deep visual SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of DROID-SLAM
(Teed & Deng, NeurIPS 2021; reference implementation at /root/reference):
monocular / stereo / RGB-D deep SLAM built on a recurrent update operator,
correlation-pyramid lookups, and dense Gauss-Newton bundle adjustment over
camera poses and per-pixel inverse depth.

Design principles (TPU-first, not a port):
  * All compute-path state lives in fixed-capacity device arrays with
    validity masks so every hot function is jit-compiled once.
  * Lie-group math is pure JAX (no native extension needed).
  * The bundle-adjustment Schur complement is solved densely on-device
    (MXU Cholesky) instead of the reference's CPU Eigen sparse solve.
  * Correlation lookups are Pallas kernels (with jnp reference fallbacks).
  * Multi-chip scaling uses jax.sharding Mesh + shard_map collectives.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level exports (keep `import droid_slam_tpu` light)."""
    if name == "Droid":
        from .runtime.slam import Droid
        return Droid
    if name == "SLAMConfig":
        from .config import SLAMConfig
        return SLAMConfig
    if name == "TrainConfig":
        from .config import TrainConfig
        return TrainConfig
    if name == "PRESETS":
        from .config import PRESETS
        return PRESETS
    raise AttributeError(name)
