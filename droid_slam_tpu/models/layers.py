"""Shared network building blocks (flax, channels-last).

Gradient clipping and normalization utilities used across the feature
encoders and the update operator.
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

# gradient magnitude threshold (reference modules/clipping.py:5)
GRAD_CLIP = 0.01


@jax.custom_vjp
def grad_clip(x):
    """Identity forward; backward zeroes grads with |g| > 0.01 or NaN.

    Replaces the reference's GradientClip autograd function
    (/root/reference/droid_slam/modules/clipping.py:8-24) — used on the
    delta/weight/eta heads to keep the unrolled-BA backward pass stable.
    """
    return x


def _grad_clip_fwd(x):
    return x, None


def _grad_clip_bwd(_, g):
    zero = jnp.zeros_like(g)
    g = jnp.where(jnp.abs(g) > GRAD_CLIP, zero, g)
    g = jnp.where(jnp.isnan(g), zero, g)
    return (g,)


grad_clip.defvjp(_grad_clip_fwd, _grad_clip_bwd)


class InstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over spatial dims.

    Equivalent to torch nn.InstanceNorm2d with affine=False,
    track_running_stats=False (the reference encoder default,
    modules/extractor.py:30-33), for NHWC inputs.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(-3, -2), keepdims=True)
        var = x.var(axis=(-3, -2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


class ConvParams(nn.Module):
    """Declare nn.Conv-compatible parameters WITHOUT the conv compute.

    Same param names ("kernel" (kh,kw,in,out), "bias" (out,)), shapes and
    initializers as the `conv` helper below, so a module can fuse several
    logical convs into one device conv (concatenated kernels) while its
    checkpoint tree stays bit-identical to the unfused layout — shipped
    npz weights and the torch converter keep working unchanged.
    """

    features: int
    in_ch: int
    kernel: int = 3

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (self.kernel, self.kernel, self.in_ch, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


def conv_nhwc(x, kernel, bias, pad=None):
    """Plain NHWC conv on explicit kernel/bias arrays (stride 1)."""
    kh = kernel.shape[0]
    if pad is None:
        pad = kh // 2
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(x.dtype)


def conv(features, kernel=3, stride=1, pad=None, name=None, dtype=None):
    """2D conv with explicit symmetric padding (torch-compatible shapes).

    Explicit padding tuples (not 'SAME') so stride-2 outputs match torch's
    floor semantics — required for bit-parity when porting droid.pth.
    """
    if pad is None:
        pad = kernel // 2
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        name=name,
        dtype=dtype,
    )
