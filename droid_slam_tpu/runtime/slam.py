"""Top-level SLAM system API.

Re-design of /root/reference/droid_slam/droid.py: composition of the
motion filter, frontend, backend, and trajectory filler over the shared
keyframe map, with `track()` per frame and `terminate()` producing the
final camera trajectory (two global-BA passes + trajectory fill).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SLAMConfig
from ..lie import se3
from ..models.droidnet import DroidNet
from .backend import Backend
from .frontend import Frontend
from .motion_filter import MotionFilter
from .state import DepthVideo
from .trajectory_filler import TrajectoryFiller


class Droid:
    def __init__(self, config: SLAMConfig, params=None, weights_path=None,
                 seed=0):
        self.cfg = config
        dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else None
        self.net = DroidNet(dtype=dtype)

        if params is None and weights_path is not None:
            from ..models.convert import load_weights
            params = load_weights(weights_path)
        if params is None:
            params = self._random_params(seed)
        self.params = params

        from ..ops import corr as _corr
        impl = config.lookup_impl
        if impl == "auto":
            # pallas_v3 needs real TPU hardware (Mosaic); every other
            # backend (CPU, GPU, ...) gets the pure-XLA onehot path
            impl = ("pallas_v3" if jax.default_backend() == "tpu"
                    else "onehot")
        _corr.set_lookup_impl(impl)   # always: resets prior global state
        self.video = DepthVideo(config)
        self.filter = MotionFilter(self.net, params, self.video,
                                   thresh=config.filter_thresh)
        if config.fused:
            from .fused import FusedFrontend
            self.frontend = FusedFrontend(self.net, params, self.video,
                                          config)
        else:
            self.frontend = Frontend(self.net, params, self.video, config)
        self.backend = Backend(self.net, params, self.video, config)
        self.traj_filler = TrajectoryFiller(self.net, params, self.video,
                                            config)

    def _random_params(self, seed):
        H, W = self.cfg.image_size
        img = jnp.zeros((1, 2, H, W, 3))
        return self.net.init(
            jax.random.PRNGKey(seed), se3.identity((1, 2)), img,
            jnp.ones((1, 2, H // 8, W // 8)),
            jnp.asarray([[[8.0, 8.0, W / 16, H / 16]] * 2]),
            np.array([0]), np.array([1]), num_steps=1,
        )

    def prewarm(self, chunk_sizes=()):
        """Compile the steady-state streaming programs up front so no
        multi-second XLA compile lands mid-stream (fused frontend only;
        the warmup-initialization programs still compile at the warmup
        boundary — they are data-dependent)."""
        if hasattr(self.frontend, "prewarm"):
            self.frontend.prewarm(chunk_sizes=chunk_sizes)

    def track(self, tstamp, image, depth=None, intrinsics=None):
        """Ingest one frame: motion filter + frontend (droid.py:61-72).

        Once the fused frontend is initialized, the whole frame is handled
        by one device program with no blocking readback (runtime/fused.py).
        """
        if self.cfg.fused and self.frontend.is_initialized:
            self.frontend.track_frame(tstamp, image, depth, intrinsics)
        else:
            self.filter.track(tstamp, image, depth, intrinsics)
            self.frontend()

    def track_batch(self, tstamps, images, intrinsics=None):
        """Throughput-mode ingestion: a chunk of RGB frames per device
        dispatch (fused.build_track_chunk).  Falls back to per-frame
        tracking until the fused frontend is initialized."""
        if self.cfg.fused and self.frontend.is_initialized and \
                hasattr(self.frontend, "track_frames"):
            self.frontend.track_frames(tstamps, images, intrinsics)
        else:
            for t, im in zip(tstamps, images):
                self.track(t, im, intrinsics=intrinsics)

    def _sync(self):
        if hasattr(self.frontend, "sync"):
            self.frontend.sync()

    def terminate(self, stream=None, backend_steps=(7, 12)):
        """Final global optimization + trajectory fill (droid.py:74-88).

        Returns (n, 7) c2w poses [t, q] for every frame of `stream`
        (or keyframe poses if no stream is given).
        """
        self._sync()
        del self.frontend

        for steps in backend_steps:
            self.backend(steps)

        if stream is not None:
            traj_w2c = self.traj_filler(stream)
        else:
            traj_w2c = np.array(self.video.state.poses[: self.video.counter])

        return np.asarray(se3.inv(jnp.asarray(traj_w2c)))
