"""MFNet — two-stream mini-inception RGB/IR baseline.

Reference: ``/root/reference/models/external_models/mfnet/model/MFNet.py:35-106``
— RGB stream channels (16,48,48,96,96), IR stream (16,16,16,36,36), 4x
max-pool downsampling, additive skip fusion in a nearest-upsample decoder.
Input is a fused NHWC (..., 4) array: RGB in channels 0-2, IR in channel 3.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import resize_nearest


class ConvBnLeakyRelu(nn.Module):
    out_channels: int
    kernel: int = 3
    padding: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    padding=((self.padding, self.padding),) * 2,
                    kernel_dilation=(self.dilation, self.dilation),
                    use_bias=True, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class MiniInception(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        half = self.out_channels // 2
        for i in range(1, 4):
            left = ConvBnLeakyRelu(half, dtype=self.dtype,
                                   name=f"conv{i}_left")(x, train)
            right = ConvBnLeakyRelu(half, padding=2, dilation=2, dtype=self.dtype,
                                    name=f"conv{i}_right")(x, train)
            x = jnp.concatenate([left, right], axis=-1)
        return x


def _pool2(x: jax.Array) -> jax.Array:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class MFNet(nn.Module):
    n_class: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        x = x.astype(dt)
        x_rgb, x_inf = x[..., :3], x[..., 3:]
        rgb_ch = [16, 48, 48, 96, 96]
        inf_ch = [16, 16, 16, 36, 36]

        def encode(y, ch, tag):
            y = ConvBnLeakyRelu(ch[0], dtype=dt, name=f"conv1_{tag}")(y, train)
            y = _pool2(y)
            y = ConvBnLeakyRelu(ch[1], dtype=dt, name=f"conv2_1_{tag}")(y, train)
            p2 = ConvBnLeakyRelu(ch[1], dtype=dt, name=f"conv2_2_{tag}")(y, train)
            y = _pool2(p2)
            y = ConvBnLeakyRelu(ch[2], dtype=dt, name=f"conv3_1_{tag}")(y, train)
            p3 = ConvBnLeakyRelu(ch[2], dtype=dt, name=f"conv3_2_{tag}")(y, train)
            y = _pool2(p3)
            p4 = MiniInception(ch[3], dtype=dt, name=f"conv4_{tag}")(y, train)
            y = _pool2(p4)
            y = MiniInception(ch[4], dtype=dt, name=f"conv5_{tag}")(y, train)
            return y, p2, p3, p4

        y_rgb, r2, r3, r4 = encode(x_rgb, rgb_ch, "rgb")
        y_inf, i2, i3, i4 = encode(x_inf, inf_ch, "inf")

        y = jnp.concatenate([y_rgb, y_inf], axis=-1)

        y = resize_nearest(y, (2 * y.shape[1], 2 * y.shape[2]))
        y = ConvBnLeakyRelu(rgb_ch[2] + inf_ch[2], dtype=dt, name="decode4")(
            y + jnp.concatenate([r4, i4], axis=-1), train)
        y = resize_nearest(y, (2 * y.shape[1], 2 * y.shape[2]))
        y = ConvBnLeakyRelu(rgb_ch[1] + inf_ch[1], dtype=dt, name="decode3")(
            y + jnp.concatenate([r3, i3], axis=-1), train)
        y = resize_nearest(y, (2 * y.shape[1], 2 * y.shape[2]))
        y = ConvBnLeakyRelu(rgb_ch[0] + inf_ch[0], dtype=dt, name="decode2")(
            y + jnp.concatenate([r2, i2], axis=-1), train)
        y = resize_nearest(y, (2 * y.shape[1], 2 * y.shape[2]))
        y = ConvBnLeakyRelu(self.n_class, dtype=dt, name="decode1")(y, train)
        return y.astype(jnp.float32)
