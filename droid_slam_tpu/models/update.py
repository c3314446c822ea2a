"""The recurrent update operator (flax, NHWC).

Re-design of /root/reference/droid_slam/droid_net.py:44-143:
  * corr/flow encoders feeding a ConvGRU;
  * `delta` head (2-ch flow correction) and `weight` head (2-ch sigmoid
    confidence), both gradient-clipped;
  * `GraphAgg`: segment-mean of the GRU state over edges sharing a source
    frame → per-frame BA damping `eta = 0.01·softplus(·)` and the 8×8×9
    convex-upsampling mask.

TPU notes: edges fold into the batch dim ((B·E), H, W, C) so every conv is
one big NHWC convolution on the MXU; the segment-mean is a static-shape
jax.ops.segment_sum (invalid/padded edges are routed to a dump segment by
the caller).
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .gru import ConvGRU
from .layers import ConvParams, conv, conv_nhwc, grad_clip

COR_PLANES = 4 * (2 * 3 + 1) ** 2  # 196 (droid_net.py:81)


def segment_mean(x, ix, nseg):
    """Mean of x over leading axis grouped by segment ids ix.

    x: (E, ...); ix: (E,) int; returns (nseg, ...).  Ids >= nseg are dropped
    (padding bucket).
    """
    ones = jnp.ones((x.shape[0],), x.dtype)
    tot = jax.ops.segment_sum(x, ix, num_segments=nseg + 1)[:-1]
    cnt = jax.ops.segment_sum(ones, ix, num_segments=nseg + 1)[:-1]
    return tot / jnp.maximum(cnt, 1.0).reshape((-1,) + (1,) * (x.ndim - 1))


class GraphAgg(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, net, ix, nseg):
        """net: (E, H, W, 128); ix: (E,) source-frame segment ids.

        Returns eta (nseg, H, W) and upmask (nseg, H, W, 576).
        """
        net = nn.relu(conv(128, 3, name="conv1", dtype=self.dtype)(net))
        net = segment_mean(net, ix, nseg)
        net = nn.relu(conv(128, 3, name="conv2", dtype=self.dtype)(net))

        eta = conv(1, 3, name="eta", dtype=self.dtype)(net)
        eta = 0.01 * nn.softplus(grad_clip(eta.astype(jnp.float32)))

        upmask = conv(8 * 8 * 9, 1, pad=0, name="upmask", dtype=self.dtype)(net)
        return eta[..., 0], upmask


class UpdateModule(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, net, inp, corr, flow=None, ix=None, nseg: Optional[int] = None):
        """One update-operator step.

        Args:
          net:  (E, H, W, 128) GRU hidden state (tanh-bounded).
          inp:  (E, H, W, 128) context features.
          corr: (E, H, W, 196) correlation taps.
          flow: (E, H, W, 4) motion features, or None for zeros.
          ix:   optional (E,) source-frame segment ids for GraphAgg.
          nseg: static segment count for GraphAgg.

        Returns (net, delta, weight[, eta, upmask]); delta/weight are fp32
        (E, H, W, 2).
        """
        E, H, W, _ = net.shape
        if flow is None:
            flow = jnp.zeros((E, H, W, 4), net.dtype)

        cor = nn.relu(conv(128, 1, pad=0, name="corr_encoder_0",
                           dtype=self.dtype)(corr.astype(net.dtype)))
        cor = nn.relu(conv(128, 3, name="corr_encoder_2", dtype=self.dtype)(cor))

        flo = nn.relu(conv(128, 7, name="flow_encoder_0",
                           dtype=self.dtype)(flow.astype(net.dtype)))
        flo = nn.relu(conv(64, 3, name="flow_encoder_2", dtype=self.dtype)(flo))

        net = ConvGRU(128, dtype=self.dtype, name="gru")(
            net, jnp.concatenate([inp, cor, flo], axis=-1)
        )

        # delta/weight heads run as ONE fused conv pair instead of four:
        # a (3,3,128,2) conv wastes >98% of the MXU's output lanes, and
        # the round-5 device trace priced the two 2-channel head convs
        # at 1.9 ms/keyframe (runs/r5/profile_chunk).  Param tree is
        # unchanged (ConvParams declares the same delta_0/weight_0/
        # delta_2/weight_2 kernels); stage 2 uses a block-diagonal
        # kernel so delta still sees only the delta branch — math is
        # bit-identical to the unfused form.
        kd0, bd0 = ConvParams(128, 128, 3, name="delta_0")()
        kw0, bw0 = ConvParams(128, 128, 3, name="weight_0")()
        kd2, bd2 = ConvParams(2, 128, 3, name="delta_2")()
        kw2, bw2 = ConvParams(2, 128, 3, name="weight_2")()
        h = nn.relu(conv_nhwc(
            net,
            jnp.concatenate([kd0, kw0], axis=-1),
            jnp.concatenate([bd0, bw0], axis=-1),
        ))
        z2 = jnp.zeros_like(kd2)
        k2 = jnp.concatenate(
            [jnp.concatenate([kd2, z2], axis=-1),
             jnp.concatenate([z2, kw2], axis=-1)], axis=2,
        )                                         # (3, 3, 256, 4)
        dw = conv_nhwc(
            h, k2, jnp.concatenate([bd2, bw2], axis=-1)
        ).astype(jnp.float32)
        delta = grad_clip(dw[..., :2])
        weight = nn.sigmoid(grad_clip(dw[..., 2:]))

        if ix is None:
            return net, delta, weight

        eta, upmask = GraphAgg(dtype=self.dtype, name="agg")(net, ix, nseg)
        return net, delta, weight, eta, upmask


def cvx_upsample(data, mask):
    """Convex-combination 8× upsampling (reference droid_net.py:21-35).

    Args:
      data: (B, H, W, C) field to upsample.
      mask: (B, H, W, 8*8*9) logits over the 3×3 neighborhood per subpixel.
    Returns:
      (B, 8H, 8W, C).
    """
    B, H, W, C = data.shape
    mask = mask.reshape(B, H, W, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    # 3×3 neighborhoods via shifted padding (zero pad, matching F.unfold)
    pad = jnp.pad(data, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [pad[:, dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # (B, H, W, 9, C)

    up = jnp.einsum("bhwkyx,bhwkc->bhwyxc", mask, neigh)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * H, 8 * W, C)
    return up


def upsample_disp(disp, mask):
    """disp: (B, H, W) -> (B, 8H, 8W) via cvx_upsample."""
    return cvx_upsample(disp[..., None], mask)[..., 0]
