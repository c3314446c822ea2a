"""DroidNet: feature extraction + recurrent update + differentiable BA.

Re-design of /root/reference/droid_slam/droid_net.py:146-222.  The training
forward unrolls `num_steps` update iterations, each running the correlation
lookup, the update operator, and two damped Gauss-Newton BA steps, with
stop-gradients between iterations (the reference detaches poses/disps/
coords each step, droid_net.py:196-199).

Image convention: this framework takes RGB images in [0, 255] (the
reference takes BGR from cv2 and flips channels internally,
droid_net.py:157); ImageNet normalization is applied here.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..geom import ba as geom_ba
from ..geom import projective
from ..ops import corr as corr_ops
from .extractor import BasicEncoder
from .update import UpdateModule, upsample_disp

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def normalize_images(images):
    """(..., H, W, 3) RGB in [0,255] -> ImageNet-normalized float."""
    x = images.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class DroidNet(nn.Module):
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.fnet = BasicEncoder(output_dim=128, norm_fn="instance",
                                 dtype=self.dtype)
        self.cnet = BasicEncoder(output_dim=256, norm_fn="none",
                                 dtype=self.dtype)
        self.update = UpdateModule(dtype=self.dtype)

    def extract_features(self, images):
        """images: (B, N, H, W, 3) RGB uint8/float.

        Returns fmaps (B,N,h,w,128), net (tanh), inp (relu) — h=H/8.
        """
        x = normalize_images(images)
        fmaps = self.fnet(x)
        ctx = self.cnet(x)
        net, inp = jnp.split(ctx, 2, axis=-1)
        return fmaps, jnp.tanh(net), jax.nn.relu(inp)

    def __call__(self, Gs, images, disps, intrinsics, ii, jj,
                 num_steps=12, fixedp=2):
        """Training forward (reference droid_net.py:172-222).

        Args:
          Gs: (B, N, 7) initial poses (w2c).
          images: (B, N, H, W, 3) RGB.
          disps: (B, N, H/8, W/8) initial inverse depths.
          intrinsics: (B, N, 4) at 1/8 resolution.
          ii, jj: static numpy edge lists.

        Returns lists (per step) of poses, upsampled disps, residuals.
        """
        ii = np.asarray(ii).reshape(-1)
        jj = np.asarray(jj).reshape(-1)
        kx, kk = np.unique(ii, return_inverse=True)
        M = len(kx)
        B = images.shape[0]
        ht, wd = images.shape[2] // 8, images.shape[3] // 8

        fmaps, net_all, inp_all = self.extract_features(images)
        net = jnp.take(net_all, ii, axis=1)
        inp = jnp.take(inp_all, ii, axis=1)

        volume = corr_ops.corr_volume(
            jnp.take(fmaps, ii, axis=1), jnp.take(fmaps, jj, axis=1)
        )
        pyramid = corr_ops.build_pyramid(volume)

        coords0 = projective.coords_grid(ht, wd)
        coords1, _ = projective.projective_transform(
            Gs, disps, intrinsics, jnp.asarray(ii), jnp.asarray(jj)
        )
        target = coords1

        E = len(ii)
        kk_j = jnp.asarray(kk)

        Gs_list, disp_list, residual_list = [], [], []
        for _ in range(num_steps):
            Gs = jax.lax.stop_gradient(Gs)
            disps = jax.lax.stop_gradient(disps)
            coords1 = jax.lax.stop_gradient(coords1)
            target = jax.lax.stop_gradient(target)

            corr = corr_ops.lookup_pyramid(pyramid, coords1)
            resd = target - coords1
            flow = coords1 - coords0
            motion = jnp.clip(
                jnp.concatenate([flow, resd], axis=-1), -64.0, 64.0
            )

            # fold (B, E) into the leading axis for the update operator
            def fold(x):
                return x.reshape((B * E,) + x.shape[2:])

            seg_ids = jnp.tile(kk_j, B) + jnp.repeat(
                jnp.arange(B) * M, E
            )
            net_f, delta, weight, eta, upmask = self.update(
                fold(net), fold(inp), fold(corr), fold(motion),
                ix=seg_ids, nseg=B * M,
            )
            net = net_f.reshape(B, E, ht, wd, 128)
            delta = delta.reshape(B, E, ht, wd, 2)
            weight = weight.reshape(B, E, ht, wd, 2)
            eta = eta.reshape(B, M, ht, wd)
            upmask = upmask.reshape(B, M, ht, wd, 8 * 8 * 9)

            target = coords1 + delta

            for _ in range(2):
                Gs, disps = geom_ba.ba(
                    target, weight, eta, Gs, disps, intrinsics, ii, jj,
                    fixedp=fixedp,
                )

            coords1, valid_mask = projective.projective_transform(
                Gs, disps, intrinsics, jnp.asarray(ii), jnp.asarray(jj)
            )
            residual = valid_mask * (target - coords1)
            # masked-out pixels can carry non-finite reprojections; keep
            # the residual loss (and its gradients) finite
            residual = jnp.where(jnp.isfinite(residual), residual, 0.0)

            # upsample the disparities of the M aggregated frames
            d_up = upsample_disp(
                jnp.take(disps, jnp.asarray(kx), axis=1).reshape(
                    B * M, ht, wd
                ),
                upmask.reshape(B * M, ht, wd, -1),
            ).reshape(B, M, 8 * ht, 8 * wd)

            Gs_list.append(Gs)
            disp_list.append(d_up)
            residual_list.append(residual)

        return Gs_list, disp_list, residual_list
