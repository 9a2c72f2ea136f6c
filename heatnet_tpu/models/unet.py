"""UNets: the half-width input adapter and the CycleGAN seg UNet.

References:
- input adapter ``UNet`` (f=2, 3 downs, 3 ups, bilinear) —
  ``/root/reference/models/confusion_maximization/models/input_adapter.py:75-101``
- ``SemanticSegmentation`` UNet (full width, 4 downs, sigmoid output) —
  ``/root/reference/models/cyclegan/models.py:189-219``
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import resize_bilinear


class DoubleConv(nn.Module):
    """(conv3x3 → BN → ReLU) x2 (input_adapter.py:5-21)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(2):
            x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name=f"bn{i + 1}")(x)
            x = nn.relu(x)
        return x


class _Down(nn.Module):
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.out_channels, self.dtype, name="conv")(x, train)


class _Up(nn.Module):
    """Bilinear x2 upsample, pad to skip size, concat, DoubleConv."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        x1 = resize_bilinear(x1, (2 * x1.shape[1], 2 * x1.shape[2]))
        dh = x2.shape[1] - x1.shape[1]
        dw = x2.shape[2] - x1.shape[2]
        x1 = jnp.pad(x1, ((0, 0), (dh // 2, dh - dh // 2),
                          (dw // 2, dw - dw // 2), (0, 0)))
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.out_channels, self.dtype, name="conv")(x, train)


class UNetAdapter(nn.Module):
    """Half-width image→image adapter UNet (input_adapter.py:75-101)."""

    n_classes: int
    f: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        f, dt = self.f, self.dtype
        x = x.astype(dt)
        x1 = DoubleConv(64 // f, dt, name="inc")(x, train)
        x2 = _Down(128 // f, dt, name="down1")(x1, train)
        x3 = _Down(256 // f, dt, name="down2")(x2, train)
        x4 = _Down(512 // f, dt, name="down3")(x3, train)
        y = _Up(128 // f, dt, name="up2")(x4, x3, train)
        y = _Up(64 // f, dt, name="up3")(y, x2, train)
        y = _Up(64 // f, dt, name="up4")(y, x1, train)
        logits = nn.Conv(self.n_classes, (1, 1), dtype=dt, name="outc")(y)
        return logits.astype(jnp.float32)


class UNetSeg(nn.Module):
    """Full-width UNet with sigmoid output (cyclegan/models.py:189-219)."""

    n_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.dtype
        x = x.astype(dt)
        x1 = DoubleConv(64, dt, name="inc")(x, train)
        x2 = _Down(128, dt, name="down1")(x1, train)
        x3 = _Down(256, dt, name="down2")(x2, train)
        x4 = _Down(512, dt, name="down3")(x3, train)
        x5 = _Down(512, dt, name="down4")(x4, train)
        y = _Up(256, dt, name="up1")(x5, x4, train)
        y = _Up(128, dt, name="up2")(y, x3, train)
        y = _Up(64, dt, name="up3")(y, x2, train)
        y = _Up(64, dt, name="up4")(y, x1, train)
        out = nn.Conv(self.n_classes, (1, 1), dtype=dt, name="outc")(y)
        return nn.sigmoid(out.astype(jnp.float32))
