"""Keyframe gating: run the feature encoder + one update step per frame.

Re-design of /root/reference/droid_slam/motion_filter.py: every incoming
frame is encoded (fnet); flow magnitude against the last keyframe is
estimated with a single update-operator iteration on the correlation of
the two feature maps; frames whose mean |delta| exceeds the threshold
become keyframes (context features are computed only then).

TPU design: the whole per-frame path (normalize → fnet → 1-edge corr
pyramid → update op → mean |delta|) is one jit-compiled function; the
keyframe decision is the only host sync per frame.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..geom import projective
from ..models.droidnet import normalize_images
from ..ops import corr as corr_ops
from ..utils.timers import GLOBAL_TIMERS as _T


class MotionFilter:
    def __init__(self, net, params, video, thresh=2.4):
        """net: DroidNet module; params: flax params; video: DepthVideo."""
        self.net = net
        self.params = params
        self.video = video
        self.thresh = thresh
        self.count = 0
        self.skip_count = 0

        # last-keyframe features (device arrays)
        self.fmap = None    # (rig, h, w, 128)
        self.knet = None    # (h, w, 128)
        self.kinp = None    # (h, w, 128)

        self._encode = jax.jit(self._encode_impl)
        self._ctx = jax.jit(self._ctx_impl)
        self._delta = jax.jit(self._delta_impl)

    # -- jitted pieces -----------------------------------------------------

    def _encode_impl(self, params, images):
        """images: (rig, H, W, 3) RGB -> fmaps (rig, h, w, 128)."""
        x = normalize_images(images)
        return self.net.apply(
            params, x, method=lambda m, x: m.fnet(x)
        )

    def _ctx_impl(self, params, image):
        """image: (H, W, 3) -> (net, inp) context features (h, w, 128)."""
        x = normalize_images(image[None])
        ctx = self.net.apply(params, x, method=lambda m, x: m.cnet(x))
        net, inp = jnp.split(ctx[0], 2, axis=-1)
        return jnp.tanh(net), jax.nn.relu(inp)

    def _delta_impl(self, params, kf_fmap, fmap, knet, kinp):
        """Mean flow-update magnitude between last keyframe and this frame
        (motion_filter.py:66-73): 1-edge corr + one update iteration."""
        f1 = kf_fmap[None, None].astype(jnp.float32)   # (1,1,h,w,128)
        f2 = fmap[None, None].astype(jnp.float32)
        volume = corr_ops.corr_volume(f1, f2)
        pyramid = corr_ops.build_pyramid(volume)
        ht, wd = kf_fmap.shape[0], kf_fmap.shape[1]
        coords0 = projective.coords_grid(ht, wd)[None, None]
        corr = corr_ops.lookup_pyramid(pyramid, coords0)

        _, delta, _ = self.net.apply(
            params, knet[None], kinp[None], corr[0],
            method=lambda m, n, i, c: m.update(n, i, c),
        )
        return jnp.mean(jnp.linalg.norm(delta, axis=-1))

    # -- per-frame entry ---------------------------------------------------

    def track(self, tstamp, image, depth=None, intrinsics=None):
        """image: (H, W, 3) RGB uint8 or (2, H, W, 3) for stereo."""
        image = jnp.asarray(image)
        if image.ndim == 3:
            image = image[None]                        # (rig, H, W, 3)

        with _T.phase("filter.encode"):
            fmap = self._encode(self.params, image)

        if self.video.counter == 0:
            knet, kinp = self._ctx(self.params, image[0])
            self.fmap, self.knet, self.kinp = fmap, knet, kinp
            self.video.append(
                tstamp, image[0],
                jnp.asarray([0, 0, 0, 0, 0, 0, 1], jnp.float32),
                None, depth, jnp.asarray(intrinsics) / 8.0,
                fmap.astype(jnp.bfloat16), knet, kinp,
            )
            return True

        with _T.phase("filter.delta"):
            delta = float(self._delta(
                self.params, self.fmap[0], fmap[0], self.knet, self.kinp
            ))
        if delta > self.thresh:
            self.count = 0
            knet, kinp = self._ctx(self.params, image[0])
            self.fmap, self.knet, self.kinp = fmap, knet, kinp
            self.video.append(
                tstamp, image[0], None, None, depth,
                jnp.asarray(intrinsics) / 8.0,
                fmap.astype(jnp.bfloat16), knet, kinp,
            )
            return True

        self.count += 1
        return False
