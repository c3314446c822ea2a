"""Feature / context encoders (flax, NHWC, bf16-friendly).

Re-design of the reference BasicEncoder
(/root/reference/droid_slam/modules/extractor.py:118-198): a 7×7 stride-2
stem plus three 2-block residual stages (32→64→128 channels, strides
1/2/2) and a 1×1 output conv — features at 1/8 input resolution.

Instantiations (droid_net.py:149-150):
  * fnet: output_dim=128, instance norm  → correlation features.
  * cnet: output_dim=256, no norm        → split into tanh(net)/relu(inp).

TPU notes: channels-last layout; compute dtype is configurable (bf16 for
inference/training compute, params stay fp32).
"""

from typing import Any

from flax import linen as nn

from .layers import InstanceNorm, conv

DIM = 32


def _norm(norm_fn: str):
    if norm_fn == "instance":
        return InstanceNorm()
    if norm_fn == "none":
        return lambda x: x
    raise ValueError(f"unsupported norm_fn: {norm_fn}")


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = conv(self.planes, 3, self.stride, name="conv1", dtype=self.dtype)(x)
        y = nn.relu(_norm(self.norm_fn)(y))
        y = conv(self.planes, 3, 1, name="conv2", dtype=self.dtype)(y)
        y = nn.relu(_norm(self.norm_fn)(y))

        if self.stride != 1:
            x = conv(self.planes, 1, self.stride, pad=0, name="downsample",
                     dtype=self.dtype)(x)
            x = _norm(self.norm_fn)(x)

        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    output_dim: int = 128
    norm_fn: str = "instance"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        """x: (..., H, W, 3) normalized images -> (..., H/8, W/8, output_dim)."""
        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])

        x = conv(DIM, 7, 2, name="conv1", dtype=self.dtype)(x)
        x = nn.relu(_norm(self.norm_fn)(x))

        for i, (planes, stride) in enumerate(
            [(DIM, 1), (2 * DIM, 2), (4 * DIM, 2)]
        ):
            x = ResidualBlock(planes, self.norm_fn, stride,
                              dtype=self.dtype, name=f"layer{i + 1}_0")(x)
            x = ResidualBlock(planes, self.norm_fn, 1,
                              dtype=self.dtype, name=f"layer{i + 1}_1")(x)

        x = conv(self.output_dim, 1, 1, pad=0, name="conv2", dtype=self.dtype)(x)
        return x.reshape(lead + x.shape[1:])
