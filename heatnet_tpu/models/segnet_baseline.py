"""SegNet baseline (MFNet harness third model).

Reference: ``models/external_models/mfnet/model/SegNet.py:1-109`` — a
13-layer VGG-ish encoder/decoder with **max-unpooling**: each 2x2/2
max-pool records its argmax indices and the mirrored decoder stage scatters
values back to those positions.

TPU-native unpooling: torch's ``return_indices``/``max_unpool2d`` pair is a
dynamic scatter; here each pool reshapes (N,H,W,C) → (N,H/2,2,W/2,2,C),
takes the max over the 2x2 cell and records the within-cell argmax (0..3).
Unpool = one-hot(argmax, 4) * value, reshaped back — static shapes, pure
gather/select math that XLA fuses (no scatter). Ties resolve to the first
max in both frameworks.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def pool_with_indices(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """2x2 stride-2 max pool returning (pooled, within-cell argmax 0..3)."""
    n, h, w, c = x.shape
    cells = x.reshape(n, h // 2, 2, w // 2, 2, c)
    cells = cells.transpose(0, 1, 3, 5, 2, 4).reshape(
        n, h // 2, w // 2, c, 4)
    idx = jnp.argmax(cells, axis=-1)
    pooled = jnp.max(cells, axis=-1)
    return pooled, idx


def unpool_with_indices(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Inverse of :func:`pool_with_indices` (zeros off the recorded argmax)."""
    n, h, w, c = x.shape
    onehot = jax.nn.one_hot(idx, 4, dtype=x.dtype)  # (n,h,w,c,4)
    cells = x[..., None] * onehot
    cells = cells.reshape(n, h, w, c, 2, 2).transpose(0, 1, 4, 2, 5, 3)
    return cells.reshape(n, h * 2, w * 2, c)


class ConvBnRelu(nn.Module):
    """Conv(3x3, bias) → BN → ReLU (SegNet.py:7-16)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=True, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class _Stage(nn.Module):
    features: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i, f in enumerate(self.features):
            x = ConvBnRelu(f, self.dtype, name=f"m{i}")(x, train)
        return x


class SegNetBaseline(nn.Module):
    """chs = [32, 64, 64, 128, 128]; 5 pooled encoder stages, mirrored
    unpooling decoder (SegNet.py:19-97)."""

    n_class: int = 9
    in_channels: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        chs = [32, 64, 64, 128, 128]
        x = x.astype(self.dtype)

        down_specs = [
            ("down1", [chs[0], chs[0]]),
            ("down2", [chs[1], chs[1]]),
            ("down3", [chs[2], chs[2], chs[2]]),
            ("down4", [chs[3], chs[3], chs[3]]),
            ("down5", [chs[4], chs[4], chs[4]]),
        ]
        indices = []
        for name, feats in down_specs:
            x = _Stage(feats, self.dtype, name=name)(x, train)
            x, idx = pool_with_indices(x)
            indices.append(idx)

        up_specs = [
            ("up5", [chs[4], chs[4], chs[3]]),
            ("up4", [chs[3], chs[3], chs[2]]),
            ("up3", [chs[2], chs[2], chs[1]]),
            ("up2", [chs[1], chs[0]]),
            ("up1", [chs[0], self.n_class]),
        ]
        for (name, feats), idx in zip(up_specs, reversed(indices)):
            x = unpool_with_indices(x, idx)
            x = _Stage(feats, self.dtype, name=name)(x, train)
        return x.astype(jnp.float32)
