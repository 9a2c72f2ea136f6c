"""Dilated ResNet feature extractors (PSPNet backbones).

Reference: ``/root/reference/models/confusion_maximization/models/extractors.py``
— torchvision-style ResNet with layer3/layer4 converted to stride-1 dilation
2/4 (8x total downsampling, :145-146), configurable ``in_channels``, and an
optional **late-fusion** twin stem + twin layer1/layer2 whose features are
concatenated before layer3 (:110-143,172-198). Forward returns 5 taps
``[x_5, x_4, x_3, x_2, x_1]`` deepest-first (:172-198).

The same ``ResNet`` with ``num_classes`` set also serves as the critic
classifier (critic_resnet.py:122-226: ``input_maps`` stem + global pool + fc
with ``num_classes=1``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import conv, max_pool_3x3_s2


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity (extractors.py:34-62). expansion = 1."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        out = conv(self.planes, 3, stride=self.stride, dilation=self.dilation,
                   name="conv1", dtype=self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, dilation=self.dilation, name="conv2",
                   dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn2")(out)
        if self.downsample:
            residual = conv(self.planes, 1, stride=self.stride,
                            name="downsample_conv", dtype=self.dtype)(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """1x1/3x3/1x1 bottleneck (extractors.py:65-101). expansion = 4."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        residual = x
        out = conv(self.planes, 1, name="conv1", dtype=self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, stride=self.stride, dilation=self.dilation,
                   name="conv2", dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.planes * 4, 1, name="conv3", dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            residual = conv(self.planes * 4, 1, stride=self.stride,
                            name="downsample_conv", dtype=self.dtype)(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(out + residual)


class _Layer(nn.Module):
    """One ResNet layer: first block may stride/project, rest dilate."""

    block: type
    planes: int
    blocks: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        need_proj = self.stride != 1 or x.shape[-1] != self.planes * self.block.expansion
        x = self.block(self.planes, self.stride, 1, need_proj, self.dtype,
                       name="block1")(x, train)
        for i in range(1, self.blocks):
            x = self.block(self.planes, 1, self.dilation, False, self.dtype,
                           name=f"block{i + 1}")(x, train)
        return x


class ResNet(nn.Module):
    """Dilated ResNet, 8x downsampling, 5 taps; optional late-fusion twin.

    ``num_classes`` switches classifier mode (global pool + fc) for critic
    use (critic_resnet.py) — in that mode layer3/4 keep stride 2 like
    torchvision and only ``x`` logits are returned.
    """

    layers: Sequence[int] = (3, 4, 23, 3)
    block_name: str = "bottleneck"
    late_fusion: bool = False
    in_channels: int = 3
    num_classes: Optional[int] = None  # None → extractor mode (dilated, 5 taps)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, modal_1: jax.Array, modal_2: Optional[jax.Array] = None,
                 train: bool = False):
        block = Bottleneck if self.block_name == "bottleneck" else BasicBlock
        dtype = self.dtype
        modal_1 = modal_1.astype(dtype)
        if modal_2 is not None:
            modal_2 = modal_2.astype(dtype)

        classifier = self.num_classes is not None

        def stem(x, suffix=""):
            x = conv(64, 7, stride=2, padding=3, name=f"conv1{suffix}", dtype=dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=dtype, name=f"bn1{suffix}")(x)
            return max_pool_3x3_s2(nn.relu(x))

        if self.late_fusion and modal_2 is not None and not classifier:
            x_1 = stem(modal_1)
            x_1_ir = stem(modal_2, "_2")
            x_2 = _Layer(block, 64, self.layers[0], dtype=dtype, name="layer1")(x_1, train)
            x_2_ir = _Layer(block, 64, self.layers[0], dtype=dtype, name="layer1_2")(x_1_ir, train)
            x_3 = _Layer(block, 128, self.layers[1], stride=2, dtype=dtype, name="layer2")(x_2, train)
            x_3_ir = _Layer(block, 128, self.layers[1], stride=2, dtype=dtype, name="layer2_2")(x_2_ir, train)
            x_3_cat = jnp.concatenate([x_3, x_3_ir], axis=-1)
            x_4 = _Layer(block, 256, self.layers[2], stride=1, dilation=2, dtype=dtype, name="layer3")(x_3_cat, train)
            x_5 = _Layer(block, 512, self.layers[3], stride=1, dilation=4, dtype=dtype, name="layer4")(x_4, train)
            return [
                x_5, x_4, x_3_cat,
                jnp.concatenate([x_2, x_2_ir], axis=-1),
                jnp.concatenate([x_1, x_1_ir], axis=-1),
            ]

        x_in = modal_1 if modal_2 is None else jnp.concatenate([modal_1, modal_2], axis=-1)
        x_1 = stem(x_in)
        x_2 = _Layer(block, 64, self.layers[0], dtype=dtype, name="layer1")(x_1, train)
        x_3 = _Layer(block, 128, self.layers[1], stride=2, dtype=dtype, name="layer2")(x_2, train)
        if classifier:
            # torchvision geometry: stride-2 layer3/4, pool, fc → (N, classes)
            x_4 = _Layer(block, 256, self.layers[2], stride=2, dtype=dtype, name="layer3")(x_3, train)
            x_5 = _Layer(block, 512, self.layers[3], stride=2, dtype=dtype, name="layer4")(x_4, train)
            x = jnp.mean(x_5, axis=(1, 2))
            return nn.Dense(self.num_classes, dtype=dtype, name="fc")(x).astype(jnp.float32)
        x_4 = _Layer(block, 256, self.layers[2], stride=1, dilation=2, dtype=dtype, name="layer3")(x_3, train)
        x_5 = _Layer(block, 512, self.layers[3], stride=1, dilation=4, dtype=dtype, name="layer4")(x_4, train)
        return [x_5, x_4, x_3, x_2, x_1]


class _DenseLayer(nn.Module):
    """BN→ReLU→1x1 conv→BN→ReLU→3x3 conv, concat onto input
    (extractors.py:206-224)."""

    growth_rate: int
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        out = nn.relu(out)
        out = conv(self.bn_size * self.growth_rate, 1, name="conv1",
                   dtype=self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype, name="norm2")(out)
        out = nn.relu(out)
        out = conv(self.growth_rate, 3, name="conv2", dtype=self.dtype)(out)
        return jnp.concatenate([x, out], axis=-1)


class _DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(self.num_layers):
            x = _DenseLayer(self.growth_rate, dtype=self.dtype,
                            name=f"denselayer{i + 1}")(x, train)
        return x


class _Transition(nn.Module):
    """BN→ReLU→1x1 conv (→ optional 2x avg-pool) (extractors.py:235-246)."""

    out_features: int
    downsample: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.relu(x)
        x = conv(self.out_features, 1, name="conv", dtype=self.dtype)(x)
        if self.downsample:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class DenseNetExtractor(nn.Module):
    """DenseNet-121-shaped dilation-free extractor (extractors.py:249-303).

    The reference keeps 8x downsampling by only letting transition1
    average-pool (``downsample = i < 1``, :284) and returns just
    ``(out, deep_features)`` — a 2-tuple its own PSPNet forward then indexes
    as 5 taps (``pspnet.py:76``), crashing. We return 5 taps (deepest-first,
    mirroring the ResNet extractor) so the full stack works:
    ``[block4(1024), transition3(512), transition2(256), block1(256), stem(64)]``.
    The reference also downloads torchvision weights unconditionally
    (:266-270); pretrained init here is external via io.torch_import.
    """

    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64
    in_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, modal_1: jax.Array, modal_2: Optional[jax.Array] = None,
                 train: bool = False):
        x = modal_1.astype(self.dtype)
        if modal_2 is not None:
            x = jnp.concatenate([x, modal_2.astype(self.dtype)], axis=-1)
        x = conv(self.num_init_features, 7, stride=2, padding=3, name="conv0",
                 dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="norm0")(x)
        x_1 = max_pool_3x3_s2(nn.relu(x))

        taps = {}
        x = x_1
        n_blocks = len(self.block_config)
        for i, num_layers in enumerate(self.block_config):
            x = _DenseBlock(num_layers, self.growth_rate, dtype=self.dtype,
                            name=f"denseblock{i + 1}")(x, train)
            if i == 0:
                taps["block1"] = x
            if i != n_blocks - 1:
                x = _Transition(x.shape[-1] // 2, downsample=(i < 1),
                                dtype=self.dtype, name=f"transition{i + 1}")(x, train)
                taps[f"transition{i + 1}"] = x
        return [x, taps["transition3"], taps["transition2"],
                taps["block1"], x_1]


class Fire(nn.Module):
    """1x1 squeeze → (1x1 expand ‖ dilated 3x3 expand), concat
    (extractors.py:306-327). Convs carry bias, as in the reference."""

    squeeze_planes: int
    expand1x1_planes: int
    expand3x3_planes: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = nn.relu(conv(self.squeeze_planes, 1, use_bias=True,
                         name="squeeze", dtype=self.dtype)(x))
        e1 = nn.relu(conv(self.expand1x1_planes, 1, use_bias=True,
                          name="expand1x1", dtype=self.dtype)(s))
        e3 = nn.relu(conv(self.expand3x3_planes, 3, dilation=self.dilation,
                          use_bias=True, name="expand3x3",
                          dtype=self.dtype)(s))
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetExtractor(nn.Module):
    """SqueezeNet-1.1 dilated extractor (extractors.py:330-360).

    The reference returns ``(f4, f3)``; we return 5 taps deepest-first
    ``[f4(512,/8), f3(256,/8), f2(128,/4), f1(64,/2), f1]`` (f1 doubled —
    the net has only four stages) so PSPNet/critic consumers see the same
    tap arity as the ResNet extractors.
    """

    in_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, modal_1: jax.Array, modal_2: Optional[jax.Array] = None,
                 train: bool = False):
        x = modal_1.astype(self.dtype)
        if modal_2 is not None:
            x = jnp.concatenate([x, modal_2.astype(self.dtype)], axis=-1)
        f1 = nn.relu(conv(64, 3, stride=2, padding=1, use_bias=True,
                          name="feat1_conv", dtype=self.dtype)(x))
        f2 = max_pool_3x3_s2(f1)
        f2 = Fire(16, 64, 64, dtype=self.dtype, name="feat2_fire1")(f2)
        f2 = Fire(16, 64, 64, dtype=self.dtype, name="feat2_fire2")(f2)
        f3 = max_pool_3x3_s2(f2)
        f3 = Fire(32, 128, 128, 2, dtype=self.dtype, name="feat3_fire1")(f3)
        f3 = Fire(32, 128, 128, 2, dtype=self.dtype, name="feat3_fire2")(f3)
        f4 = Fire(48, 192, 192, 4, dtype=self.dtype, name="feat4_fire1")(f3)
        f4 = Fire(48, 192, 192, 4, dtype=self.dtype, name="feat4_fire2")(f4)
        f4 = Fire(64, 256, 256, 4, dtype=self.dtype, name="feat4_fire3")(f4)
        f4 = Fire(64, 256, 256, 4, dtype=self.dtype, name="feat4_fire4")(f4)
        return [f4, f3, f2, f1, f1]


_RESNETS = {
    "resnet18": dict(layers=(2, 2, 2, 2), block_name="basic"),
    "resnet34": dict(layers=(3, 4, 6, 3), block_name="basic"),
    "resnet50": dict(layers=(3, 4, 6, 3), block_name="bottleneck"),
    "resnet101": dict(layers=(3, 4, 23, 3), block_name="bottleneck"),
    "resnet152": dict(layers=(3, 8, 36, 3), block_name="bottleneck"),
}


def make_resnet(variant: str, **kw) -> ResNet:
    """Factory mirroring extractors.py:369-408 / critic_resnet.py:228-349."""
    if variant not in _RESNETS:
        raise KeyError(f"unknown resnet variant {variant}")
    return ResNet(**_RESNETS[variant], **kw)


def make_extractor(variant: str, late_fusion: bool = False, in_channels: int = 3,
                   dtype: Any = jnp.float32, name: Optional[str] = None):
    """Any of the 7 reference extractor backends (extractors.py:368-408)."""
    if variant in _RESNETS:
        return make_resnet(variant, late_fusion=late_fusion,
                           in_channels=in_channels, dtype=dtype, name=name)
    if variant == "densenet":
        if late_fusion:
            raise ValueError("densenet extractor has no late-fusion variant "
                             "(reference extractors.py:372-373)")
        return DenseNetExtractor(in_channels=in_channels, dtype=dtype, name=name)
    if variant == "squeezenet":
        if late_fusion:
            raise ValueError("squeezenet extractor has no late-fusion variant "
                             "(reference extractors.py:368-369)")
        return SqueezeNetExtractor(in_channels=in_channels, dtype=dtype, name=name)
    raise KeyError(f"unknown extractor variant {variant}")


def feature_channels(variant: str, late_fusion: bool = False) -> Sequence[int]:
    """Channels of the 5 taps, deepest-first (for PSPNet psp_size etc.)."""
    if variant == "densenet":
        return [1024, 512, 256, 256, 64]
    if variant == "squeezenet":
        return [512, 256, 128, 64, 64]
    exp = 4 if _RESNETS[variant]["block_name"] == "bottleneck" else 1
    base = [512 * exp, 256 * exp, 128 * exp, 64 * exp, 64]
    if late_fusion:
        base = [base[0], base[1], base[2] * 2, base[3] * 2, base[4] * 2]
    return base
