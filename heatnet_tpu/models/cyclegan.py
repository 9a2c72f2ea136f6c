"""CycleGAN generator/discriminator for IR day↔night translation.

Reference: ``/root/reference/models/cyclegan/models.py`` — ``Generator``
c7s1-64 → 2x downsample → 9 residual blocks → 2x upsample → c7s1 + tanh
(:26-67); patch ``Discriminator`` + global average pooling (:69-97).
Reflection padding and parameter-free InstanceNorm match torch defaults.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import deconv, instance_norm, normal002


def _reflect_pad(x: jax.Array, p: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class ResidualBlock(nn.Module):
    """reflectpad1 + conv3 + IN + relu + reflectpad1 + conv3 + IN, residual."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = _reflect_pad(x, 1)
        y = nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype,
                    kernel_init=normal002, name="conv1")(y)
        y = nn.relu(instance_norm(y))
        y = _reflect_pad(y, 1)
        y = nn.Conv(self.features, (3, 3), padding="VALID", dtype=self.dtype,
                    kernel_init=normal002, name="conv2")(y)
        return x + instance_norm(y)


class Generator(nn.Module):
    """CycleGAN ResNet generator (models.py:26-67)."""

    output_nc: int
    n_residual_blocks: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.dtype
        x = x.astype(dt)
        y = _reflect_pad(x, 3)
        y = nn.Conv(64, (7, 7), padding="VALID", dtype=dt,
                    kernel_init=normal002, name="inconv")(y)
        y = nn.relu(instance_norm(y))

        feats = 64
        for i in range(2):  # downsampling
            feats *= 2
            y = nn.Conv(feats, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=dt, kernel_init=normal002, name=f"down{i + 1}")(y)
            y = nn.relu(instance_norm(y))

        for i in range(self.n_residual_blocks):
            y = ResidualBlock(feats, dt, name=f"res{i + 1}")(y)

        for i in range(2):  # upsampling: ConvTranspose2d(3, s2, p1, op1) → 2x
            feats //= 2
            # torch output_padding=1 adds one row/col at bottom/right: flax
            # per-side pad (k-1-p, k-1-p+op) = (1, 2) gives out = 2n exactly.
            y = nn.ConvTranspose(feats, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 dtype=dt, kernel_init=normal002,
                                 name=f"up{i + 1}")(y)
            y = nn.relu(instance_norm(y))

        y = _reflect_pad(y, 3)
        y = nn.Conv(self.output_nc, (7, 7), padding="VALID", dtype=dt,
                    kernel_init=normal002, name="outconv")(y)
        return jnp.tanh(y.astype(jnp.float32))


# The CycleGAN patch discriminator (models.py:69-97) is architecturally
# identical to the confusion-stack pool critic — reuse one implementation.
from .critics import PoolDiscriminator as Discriminator  # noqa: E402,F401
