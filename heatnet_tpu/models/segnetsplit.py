"""Split encoder/decoder ResNeXt used by the IR-uncertainty pretrainer.

Reference: ``/root/reference/models/confusion_maximization/models/segnetsplit.py``
— ``ResNeXtEncoder`` (stages + bn_out + ASPP, returns ``(aspp_out, out_4)``,
:240-385) and ``ResNeXtDecoder`` (2x deconv + ``fuseModule2`` whose final
deconv is ConvTranspose2d(8, stride=2, padding=3) → another 2x, :388-413).
The uncertainty pretrainer (train_ir_uncertainty.py:101-146) instantiates one
encoder and two decoders: a seg head and a sigmoid uncertainty head.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (ABN, ASPP, BN_STATS_SAVE_POLICY, NormAct, conv,
                     deconv)
from .trgb_segnet import Stem7x7, _Stage
from .layers import InitBlock


class FuseModule2(nn.Module):
    """Like FuseModule but the trailing deconv is 2x (segnetsplit.py:203-211)."""

    out_channels: int
    norm_act: NormAct = NormAct()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ch_in = x.shape[-1]
        x = conv(ch_in, 3, name="conv1", dtype=self.dtype)(x)
        x = ABN(self.norm_act, self.dtype, name="bn1")(x, train)
        x = conv(ch_in, 3, name="conv2", dtype=self.dtype)(x)
        x = ABN(self.norm_act, self.dtype, name="bn2")(x, train)
        x = conv(self.out_channels, 3, name="conv3", dtype=self.dtype)(x)
        return deconv(self.out_channels, 8, 2, 3, name="up", dtype=self.dtype)(x)


class ResNeXtEncoder(nn.Module):
    """Backbone + ASPP; returns ``(aspp_out, out_4)`` (stage-2 features)."""

    structure: Sequence[int] = (3, 4, 6, 3)
    groups: int = 64
    classes: int = 12
    in_channels: int = 3
    input_3x3: bool = False
    dilation: Any = (1, 1, 2, 4)
    base_channels: Sequence[int] = (128, 128, 256)
    norm_act: NormAct = NormAct()
    dtype: Any = jnp.float32
    remat: bool = False  # checkpoint backbone stages (train memory)

    @nn.compact
    def __call__(self, img: jax.Array, train: bool = False):
        dtype, norm_act = self.dtype, self.norm_act
        x = img.astype(dtype)
        stem = InitBlock if self.input_3x3 else Stem7x7
        x = stem(norm_act, dtype, name="mod1")(x, train)

        ch = [list(self.base_channels)]
        for _ in range(3):
            ch.append([c * 2 for c in ch[-1]])

        # policy: save the named BN batch stats so the backward re-forward
        # skips the stat reduces (layers.py StatNamedBatchNorm)
        stage_cls = (nn.remat(_Stage, static_argnums=(2,),
                              policy=BN_STATS_SAVE_POLICY) if self.remat
                     else _Stage)
        out_4 = stage_cls(self.structure[0], ch[0], 0, self.groups, self.dilation,
                          norm_act, dtype, name="mod2_1")(x, train)
        x = stage_cls(self.structure[1], ch[1], 1, self.groups, self.dilation,
                      norm_act, dtype, name="mod3_1")(out_4, train)
        x = stage_cls(self.structure[2], ch[2], 2, self.groups, self.dilation,
                      norm_act, dtype, name="mod4_1")(x, train)
        x = stage_cls(self.structure[3], ch[3], 3, self.groups, self.dilation,
                      norm_act, dtype, name="mod5_1")(x, train)
        x = ABN(norm_act, dtype, name="bn_out_1")(x, train)
        seg, _, _ = ASPP(self.classes, cert_head=False, norm_act=norm_act,
                         dtype=dtype, name="aspp")(x, train)
        return seg, out_4


class ResNeXtDecoder(nn.Module):
    """2x deconv, concat stage-2 skip, FuseModule2 (another 2x), activation."""

    out_classes: int = 12
    last_activation: str = "none"  # none | sigmoid | log_softmax
    norm_act: NormAct = NormAct()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, encoded: jax.Array, out_4: jax.Array,
                 train: bool = False) -> jax.Array:
        seg = deconv(self.out_classes, 4, 2, 1, name="up_seg_2",
                     dtype=self.dtype)(encoded.astype(self.dtype))
        seg = FuseModule2(self.out_classes, self.norm_act, self.dtype,
                          name="fuse_seg2")(
            jnp.concatenate([seg, out_4.astype(self.dtype)], axis=-1), train
        )
        seg = seg.astype(jnp.float32)
        if self.last_activation == "sigmoid":
            return nn.sigmoid(seg)
        if self.last_activation == "log_softmax":
            return nn.log_softmax(seg, axis=-1)
        return seg
