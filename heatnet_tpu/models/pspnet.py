"""PSPNet — pyramid scene parsing head on a dilated ResNet extractor.

Reference (HeatNet variant):
``/root/reference/models/confusion_maximization/models/pspnet.py`` —
``PSPModule`` with adaptive-pool sizes (1, 2, 3, 6) + 1x1 bottleneck to 1024
(:8-25), three ``PSPUpsample`` x2 stages (:28-40), Dropout2d 0.3/0.15, final
1x1 conv; forward returns ``(out, [out, f0..f4], None)`` matching the
trgb_segnet output tuple (:60-76). The Vistas variant
(``models/pspnet.py``) is the same design restricted to 3 input channels.

TPU notes: the adaptive pools lower to two small matmuls (layers.adaptive_avg_pool);
channel dropout uses broadcast dims so the mask is (N,1,1,C).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .extractors import feature_channels, make_extractor
from .layers import adaptive_avg_pool, conv, resize_bilinear


class _BottleneckParams(nn.Module):
    """Parameter holder shaped EXACTLY like ``nn.Conv(out, (1,1))`` over
    ``in_features`` channels — same names (``kernel``/``bias``), shapes and
    init — so checkpoints and torch imports are identical whichever PSP
    dispatch runs. Returns the raw (kernel, bias) for chunked application."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, self.in_features, self.out_features),
                            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_features,), jnp.float32)
        return kernel, bias


class PSPModule(nn.Module):
    """Pyramid pooling: priors at sizes + identity, 1x1 bottleneck, ReLU.

    Two mathematically-equal dispatches over the SAME parameters:

    - reference form: upsample each 2048-ch prior to (h, w), concat to
      5x2048 channels, one 1x1 bottleneck. The concat materializes a
      (N, h, w, 10240) tensor and the upsamples move 2048-ch maps —
      measured 92.4 ms of the batch-128 PSPNet frame at 320x704, 1.91x
      its roofline bound (tools/bench_pspnet_roofline.py).
    - chunked form (default, ``HEATNET_PSP_FUSED=0`` to disable): split
      the bottleneck kernel along its input axis into one chunk per
      prior; apply each chunk as a 1x1 matmul ON THE TINY POOLED MAP
      (s x s, before upsampling — 1x1 convs commute exactly with the
      linear bilinear resize), upsample the 1024-ch chunk outputs, and
      sum. No concat, upsample traffic halved, and the only large matmul
      left is the identity chunk over ``feats``. Same parameters, same
      math up to float reassociation (max |Δ| 7.7e-7 on f32 test
      shapes; torch forward parity passes unchanged). Measured
      (tools/bench_pspnet.py, v5e batch 128 at 320x704): 329.8 ->
      **396.0 fps (+20%)** — see README.
    """

    out_features: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: jax.Array) -> jax.Array:
        import os

        h, w = feats.shape[1:3]
        c_in = feats.shape[-1]
        small = []
        for i, size in enumerate(self.sizes):
            p = adaptive_avg_pool(feats, (size, size))
            small.append(conv(c_in, 1, name=f"stage{i + 1}_conv",
                              dtype=self.dtype)(p))

        n_chunks = len(self.sizes) + 1
        if os.environ.get("HEATNET_PSP_FUSED", "1") != "1":
            priors = [resize_bilinear(p, (h, w)) for p in small] + [feats]
            bottle = nn.Conv(self.out_features, (1, 1), use_bias=True,
                             dtype=self.dtype, name="bottleneck")(
                jnp.concatenate(priors, axis=-1)
            )
            return nn.relu(bottle)

        kernel, bias = _BottleneckParams(n_chunks * c_in, self.out_features,
                                         name="bottleneck")()

        def chunk(x, i):
            wk = kernel[0, 0, i * c_in:(i + 1) * c_in].astype(self.dtype)
            return jax.lax.dot_general(
                x.astype(self.dtype), wk,
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())))

        bottle = chunk(feats, len(self.sizes))
        for i, p in enumerate(small):
            bottle = bottle + resize_bilinear(chunk(p, i), (h, w)).astype(
                bottle.dtype)
        return nn.relu(bottle + bias.astype(bottle.dtype))


class PSPUpsample(nn.Module):
    """x2 bilinear upsample → 3x3 conv → BN → PReLU (pspnet.py:28-40)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h, w = 2 * x.shape[1], 2 * x.shape[2]
        p = resize_bilinear(x, (h, w))
        p = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=True, dtype=self.dtype, name="conv")(p)
        p = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(p)
        return nn.PReLU(param_dtype=jnp.float32, name="prelu")(p)


class PSPNet(nn.Module):
    """feats → PSP → drop(0.3) → up x3 with drop(0.15) → 1x1 final.

    Returns ``(out, [out, f0, f1, f2, f3, f4], None)``.
    """

    n_classes: int = 13
    sizes: Sequence[int] = (1, 2, 3, 6)
    psp_size: int = 2048
    backend: str = "resnet50"
    late_fusion: bool = False
    in_channels: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, modal_1: jax.Array, modal_2: Optional[jax.Array] = None,
                 train: bool = False):
        feats = make_extractor(self.backend, late_fusion=self.late_fusion,
                               in_channels=self.in_channels, dtype=self.dtype,
                               name="feats")(modal_1, modal_2, train)
        p = PSPModule(1024, self.sizes, dtype=self.dtype, name="psp")(feats[0])
        drop1 = nn.Dropout(rate=0.3, broadcast_dims=(1, 2), deterministic=not train)
        drop2 = nn.Dropout(rate=0.15, broadcast_dims=(1, 2), deterministic=not train)
        p = drop1(p)
        p = PSPUpsample(256, self.dtype, name="up_1")(p, train)
        p = drop2(p)
        p = PSPUpsample(64, self.dtype, name="up_2")(p, train)
        p = drop2(p)
        p = PSPUpsample(64, self.dtype, name="up_3")(p, train)
        p = drop2(p)
        out = nn.Conv(self.n_classes, (1, 1), use_bias=True, dtype=self.dtype,
                      name="final")(p)
        out = out.astype(jnp.float32)
        return out, [out] + list(feats), None


def pspnet_tap_channels(backend: str = "resnet50", classes: int = 13,
                        late_fusion: bool = False) -> list:
    """Critic tap channels for arch='pspnet' (conf_segnet.py:44-49)."""
    return [classes] + list(feature_channels(backend, late_fusion))
