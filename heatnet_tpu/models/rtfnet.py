"""RTFNet — dual-ResNet RGB-T baseline with elementwise-sum fusion.

Reference: ``/root/reference/models/external_models/rtfnet/model/RTFNet.py``
— two torchvision ResNet-50 encoders (the thermal stem is a 1-channel conv
initialized from the mean of the RGB conv1 weights, :40-41), per-stage
elementwise addition of thermal into RGB, and a ``TransBottleneck`` decoder of
five x2 stages (:190-238). Input is fused NHWC (..., 4).

The encoders here reuse :class:`heatnet_tpu.models.extractors` blocks with
torchvision geometry (stride-2 layer3/4, no dilation).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .extractors import Bottleneck, _Layer
from .layers import conv, deconv, max_pool_3x3_s2


class TransBottleneck(nn.Module):
    """Decoder bottleneck (RTFNet.py:190-238): 1x1 conv → 3x3 conv →
    (2x2 transposed conv when upsampling, else 3x3 conv) with a projection
    shortcut on the upsampling block."""

    planes: int
    stride: int = 1
    upsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=dt, name=name)

        out = conv(self.planes, 1, name="conv1", dtype=dt)(x)
        out = nn.relu(bn("bn1")(out))
        out = conv(self.planes, 3, name="conv2", dtype=dt)(out)
        out = nn.relu(bn("bn2")(out))
        if self.upsample and self.stride != 1:  # transposed 2x conv
            out = deconv(self.planes, 2, 2, 0, name="conv3", dtype=dt)(out)
        else:
            out = conv(self.planes, 3, stride=self.stride, name="conv3",
                       dtype=dt)(out)
        out = bn("bn3")(out)

        residual = x
        if self.upsample:
            if self.stride != 1:
                residual = deconv(self.planes, 2, 2, 0, name="upsample_conv", dtype=dt)(x)
            else:
                residual = conv(self.planes, 1, name="upsample_conv", dtype=dt)(x)
            residual = bn("upsample_bn")(residual)
        return nn.relu(out + residual)


class _TransLayer(nn.Module):
    """blocks-1 keep-shape bottlenecks then one upsampling bottleneck."""

    planes: int
    blocks: int
    stride: int
    in_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(1, self.blocks):
            x = TransBottleneck(self.in_planes, 1, False, self.dtype,
                                name=f"block{i}")(x, train)
        need_up = self.stride != 1 or self.in_planes != self.planes
        x = TransBottleneck(self.planes, self.stride, need_up, self.dtype,
                            name=f"block{self.blocks}")(x, train)
        return x


class RTFNet(nn.Module):
    n_class: int = 9
    layers: tuple = (3, 4, 6, 3)  # resnet50
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        x = x.astype(dt)
        rgb, thermal = x[..., :3], x[..., 3:]

        def stem(y, tag):
            y = conv(64, 7, stride=2, padding=3, name=f"encoder_{tag}_conv1", dtype=dt)(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=dt, name=f"encoder_{tag}_bn1")(y)
            return nn.relu(y)

        rgb = stem(rgb, "rgb")
        thermal = stem(thermal, "thermal")
        rgb = rgb + thermal
        rgb = max_pool_3x3_s2(rgb)
        thermal = max_pool_3x3_s2(thermal)

        planes = [64, 128, 256, 512]
        strides = [1, 2, 2, 2]
        for i in range(4):
            rgb = _Layer(Bottleneck, planes[i], self.layers[i], stride=strides[i],
                         dtype=dt, name=f"encoder_rgb_layer{i + 1}")(rgb, train)
            thermal = _Layer(Bottleneck, planes[i], self.layers[i], stride=strides[i],
                             dtype=dt, name=f"encoder_thermal_layer{i + 1}")(thermal, train)
            rgb = rgb + thermal

        inplanes = 2048
        fuse = rgb
        for i in range(1, 5):
            fuse = _TransLayer(inplanes // 2, 2, 2, inplanes, dt,
                               name=f"deconv{i}")(fuse, train)
            inplanes //= 2
        fuse = _TransLayer(self.n_class, 2, 2, inplanes, dt, name="deconv5")(fuse, train)
        return fuse.astype(jnp.float32)
