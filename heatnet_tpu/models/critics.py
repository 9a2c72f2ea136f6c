"""Adversarial critics and the downscale feedback nets.

References:
- ``FCDiscriminator`` — 5x (4x4 stride-2 conv) + LeakyReLU(0.2), bilinear
  x32 upsample patch-GAN map
  (``/root/reference/models/confusion_maximization/discriminator_model.py:35-64``).
- global-pool ``Discriminator`` — 4 convs + FCN layer + global avg pool
  (same file :5-33; also models/cyclegan/models.py:69-97).
- ResNet critic — torchvision ResNet classifier with ``input_maps`` stem and
  ``num_classes=1`` (critic_resnet.py:122-349) → built on
  :class:`heatnet_tpu.models.extractors.ResNet` in classifier mode.
- ``DownNet`` feedback-seg shrinkers — N x (3x3 conv + InstanceNorm + 0.5x
  bilinear) (downscale_network.py:5-35). NOTE the reference hardcodes 12
  channels and would crash on its own 13-channel seg logits; here the channel
  count follows the input (documented deviation, SURVEY.md §7 known defects).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .extractors import make_resnet
from .layers import instance_norm, normal002, resize_bilinear


class FCDiscriminator(nn.Module):
    """Fully-convolutional patch critic; output upsampled x32 to input size."""

    ndf: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        del train  # no normalization layers
        x = x.astype(self.dtype)
        in_hw = x.shape[1:3]
        widths = [self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8]
        for i, w in enumerate(widths):
            x = nn.Conv(w, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, kernel_init=normal002,
                        name=f"conv{i + 1}")(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Conv(1, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, kernel_init=normal002, name="classifier")(x)
        # reference upsamples by a fixed x32 scale factor; emit at input size
        # (identical for stride-aligned inputs, robust for ragged ones)
        return resize_bilinear(x.astype(jnp.float32), in_hw)


class PoolDiscriminator(nn.Module):
    """PatchGAN conv stack + global average pooling → (N, 1) score."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        del train
        x = x.astype(self.dtype)
        x = nn.Conv(64, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, kernel_init=normal002, name="conv1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(128, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, kernel_init=normal002, name="conv2")(x)
        x = nn.leaky_relu(instance_norm(x), 0.2)
        x = nn.Conv(256, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, kernel_init=normal002, name="conv3")(x)
        x = nn.leaky_relu(instance_norm(x), 0.2)
        x = nn.Conv(512, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, kernel_init=normal002, name="conv4")(x)
        x = nn.leaky_relu(instance_norm(x), 0.2)
        x = nn.Conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, kernel_init=normal002, name="conv5")(x)
        return jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (N, 1)


class DownNet(nn.Module):
    """N x (3x3 conv + InstanceNorm + 0.5x bilinear) seg-logit shrinker."""

    downsampling: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        del train
        x = x.astype(self.dtype)
        ch = x.shape[-1]
        for i in range(self.downsampling):
            x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name=f"down{i + 1}_conv")(x)
            x = instance_norm(x)
            x = resize_bilinear(x, (x.shape[1] // 2, x.shape[2] // 2))
        return x


def create_critic(disc_arch: str, dtype: Any = jnp.float32):
    """Critic factory (conf_segnet.py:13-20): 'cyclegan' → FCDiscriminator,
    'resnet*' → ResNet classifier with one output."""
    if disc_arch == "cyclegan":
        return FCDiscriminator(dtype=dtype)
    if "resnet" in disc_arch:
        return make_resnet(disc_arch, num_classes=1, dtype=dtype)
    raise ValueError(f"unknown critic architecture {disc_arch}")
