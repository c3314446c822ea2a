"""Convolutional GRU with a global-context term (flax, NHWC).

Re-design of /root/reference/droid_slam/modules/gru.py:5-32: a 3×3 gated
GRU whose z/r/q gates each receive an additive 1×1-conv projection of a
sigmoid-gated spatial mean of the hidden state ("global context").
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import conv


class ConvGRU(nn.Module):
    h_planes: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, net, inp):
        """net: (Q, H, W, h_planes) hidden state; inp: (Q, H, W, C_in)."""
        net_inp = jnp.concatenate([net, inp], axis=-1)

        # global context: sigmoid-gated spatial mean, (Q, 1, 1, C)
        glo = nn.sigmoid(conv(self.h_planes, 1, pad=0, name="w",
                              dtype=self.dtype)(net)) * net
        glo = glo.mean(axis=(-3, -2), keepdims=True)

        z = nn.sigmoid(
            conv(self.h_planes, 3, name="convz", dtype=self.dtype)(net_inp)
            + conv(self.h_planes, 1, pad=0, name="convz_glo",
                   dtype=self.dtype)(glo)
        )
        r = nn.sigmoid(
            conv(self.h_planes, 3, name="convr", dtype=self.dtype)(net_inp)
            + conv(self.h_planes, 1, pad=0, name="convr_glo",
                   dtype=self.dtype)(glo)
        )
        q = nn.tanh(
            conv(self.h_planes, 3, name="convq", dtype=self.dtype)(
                jnp.concatenate([r * net, inp], axis=-1)
            )
            + conv(self.h_planes, 1, pad=0, name="convq_glo",
                   dtype=self.dtype)(glo)
        )
        return (1.0 - z) * net + z * q
