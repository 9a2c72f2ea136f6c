"""ResNeXt-ASPP segmentation network ("segnet"), Vistas and HeatNet variants.

One flax module covers both reference implementations:

- Vistas variant (``/root/reference/models/segnet.py:224-366``): RGB-only,
  optional 7x7 stem, returns logits only.
- HeatNet trgb variant
  (``/root/reference/models/confusion_maximization/models/trgb_segnet.py:242-416``):
  configurable input channels (RGB+IR early fusion), optional **late fusion**
  (dual stems ``mod1``/``mod1_2`` + dual stage-2, concatenated before stage
  3), optional certainty branch, and 6 intermediate feature taps consumed by
  the adversarial critics.

Output tuple mirrors trgb_segnet.forward (:399-402):
``(seg, [seg, cat(fusion, skip_down), out_4, out_3, out_2, out_1], seg_cert)``.

TPU notes: NHWC; compute dtype is configurable (bfloat16 keeps the grouped
convs and deconvs on the MXU at full rate); logits are returned float32.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import (
    ABN,
    ASPP,
    BN_STATS_SAVE_POLICY,
    CONV_SAVE_POLICY,
    FuseModule,
    InitBlock,
    IdentityResidualBlock,
    NormAct,
    adaptive_avg_pool,
    conv,
    deconv,
    max_pool_3x3_s2,
    stride_dilation,
)


class _Stage(nn.Module):
    """A group of IdentityResidualBlocks (one ``mod{i}_{j}`` of the reference)."""

    num_blocks: int
    channels: Sequence[int]
    mod_id: int
    groups: int
    dilation: Any
    norm_act: NormAct
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for block_id in range(self.num_blocks):
            s, d = stride_dilation(self.mod_id, block_id, self.dilation)
            x = IdentityResidualBlock(
                channels=self.channels,
                stride=s,
                dilation=d,
                groups=self.groups,
                norm_act=self.norm_act,
                dtype=self.dtype,
                name=f"block{block_id + 1}",
            )(x, train)
        return x


class Stem7x7(nn.Module):
    """7x7 stride-1 conv + maxpool stem (segnet.py:272-276, input_3x3=False)."""

    norm_act: NormAct
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = conv(64, 7, padding=3, name="conv1", dtype=self.dtype)(x)
        return max_pool_3x3_s2(x)


class ResNeXtSeg(nn.Module):
    """Pre-activation ResNeXt backbone + ASPP + fuse/upsample head.

    Parameters mirror the reference constructors; ``structure=[3,4,6,3]`` is
    resnext50 (trgb_segnet.py:419-423).
    """

    structure: Sequence[int] = (3, 4, 6, 3)
    groups: int = 64
    classes: int = 13
    dilation: Any = (1, 1, 2, 4)
    base_channels: Sequence[int] = (128, 128, 256)
    input_channels: int = 4  # early-fusion stem width (ignored for late fusion)
    cert_branch: bool = False
    late_fusion: bool = False
    input_3x3: bool = True  # False → Vistas 7x7 stem (2x downsample stem)
    norm_act: NormAct = NormAct()
    dtype: Any = jnp.float32
    remat: bool = False  # checkpoint each backbone stage (train memory)

    @nn.compact
    def __call__(
        self,
        modal_1: jax.Array,
        modal_2: Optional[jax.Array] = None,
        train: bool = False,
        forward_decoder: bool = True,
    ):
        """modal_1/modal_2 are NHWC (e.g. RGB and IR); modal_2 may be None."""
        norm_act, dtype = self.norm_act, self.dtype
        modal_1 = modal_1.astype(dtype)
        if modal_2 is not None:
            modal_2 = modal_2.astype(dtype)

        # Rematerialization: saving every residual-block activation at
        # batch 30 x 384x768 oversubscribes v5e HBM (measured 1466 ms/step
        # from spilling vs 85 ms at batch 8 pre-remat); checkpointing each
        # stage keeps only stage boundaries live and recomputes one stage
        # at a time in the backward pass.
        # static_argnums counts (self, x, train) in flax's remat wrapping.
        # The policy saves each BN's named per-channel batch stats so the
        # backward re-forward skips every stat reduce (layers.py
        # StatNamedBatchNorm) — reduces are full HBM re-reads of the conv
        # outputs and cost 172 ms of the B=16 adversarial seg step.
        # HEATNET_REMAT_STAGES gates remat per backbone stage (mod2..mod5):
        # '1' remats the stage (BN stats saved), '0' saves its internals
        # and skips the backward re-forward entirely, 'c' remats with the
        # block conv outputs ALSO saved (CONV_SAVE_POLICY) — no conv
        # recompute, ~1/3 of '0's held bytes. Default "11cc" = conv-save
        # mod4+mod5, full-remat mod2+mod3 — measured best at BOTH
        # reference operating points (v5e, scan-differenced,
        # tools/sweep_train_dispatch.py): mod4/mod5 carry the expensive
        # re-forwards (wide 1x1s at 1/8 res) while their conv outputs are
        # cheap to hold; mod2/mod3's big early tensors are what OOM.
        # Measured (vs the round-2 "1110" default): adv seg B=16
        # 472.5 -> 459.6 ms, Vistas B=30 635.9 -> 617.0; "cccc" ties adv
        # (458.6) but OOMs Vistas; "1110"'s saved-everything mod5 also sat
        # at 14.1 GB peak, host-offloading cold params (~2.4k copy-starts
        # in the compiled scan graph). Set "1111" for workloads larger
        # than the reference's where even the conv-out saves stop fitting.
        # Round-4 addition, work-gated default: at small work volumes the
        # step is nowhere near HBM capacity and every remat mode only adds
        # recompute — "0000" (save everything) measures fastest — while at
        # the large operating points "11cc" wins. Measured scan-differenced
        # (v5e, tools/sweep_train_dispatch.py, 2026-08-21, N*H*W pixels of
        # the modal-1 input in parentheses):
        #   adv  B=4  (0.8M): 0000 195.0 ms vs 11cc 202.2, cccc 204.9
        #   vistas B=8 (2.4M): 0000 167.5 ms vs 11cc 176.5, cccc 174.7
        #   adv  B=16 (3.3M): 11cc 459.5 (0000-class OOMs/spills, r2)
        #   vistas B=30 (8.8M): 11cc 617.0 (0000 OOM, r2)
        # "auto" (the default) picks 0000 below 3M pixels, 11cc at or
        # above — the winner at every measured point. Explicit masks
        # override.
        import os

        remat_mask = os.environ.get("HEATNET_REMAT_STAGES", "auto")
        if remat_mask == "auto":
            n, h, w = modal_1.shape[:3]
            try:
                small = bool(n * h * w < 3_000_000)
            except Exception:
                # symbolic dims (jax.export with a polymorphic batch,
                # cli/export_model.py) make the comparison inconclusive;
                # exports are inference graphs where the remat wrapper is
                # inert, so either mask is correct — pick the large-work
                # default (round-4 regression: InconclusiveDimension-
                # Operation broke test_export_symbolic_batch)
                small = False
            remat_mask = "0000" if small else "11cc"
        remat_stage_cls = nn.remat(_Stage, static_argnums=(2,),
                                   policy=BN_STATS_SAVE_POLICY)
        # 'c' mode: remat with the block conv outputs ALSO saved
        # (CONV_SAVE_POLICY) — the backward re-forward degenerates to the
        # elementwise BN/act sweep (no conv recompute) at ~1/3 the held
        # bytes of a '0' (save-everything) stage. See the measured table
        # in README (tools/sweep_train_dispatch.py).
        convsave_stage_cls = nn.remat(_Stage, static_argnums=(2,),
                                      policy=CONV_SAVE_POLICY)

        def stage(name: str, mod_id: int, channels) -> _Stage:
            stage_cls = _Stage
            if self.remat and remat_mask[mod_id] == "1":
                stage_cls = remat_stage_cls
            elif self.remat and remat_mask[mod_id] == "c":
                stage_cls = convsave_stage_cls
            return stage_cls(
                num_blocks=self.structure[mod_id],
                channels=channels,
                mod_id=mod_id,
                groups=self.groups,
                dilation=self.dilation if self.dilation != 1 else 1,
                norm_act=norm_act,
                dtype=dtype,
                name=name,
            )

        ch = [list(self.base_channels)]
        for _ in range(3):
            ch.append([c * 2 for c in ch[-1]])

        stem = InitBlock if self.input_3x3 else Stem7x7

        if self.late_fusion and modal_2 is not None:
            out_1a = stem(norm_act, dtype, name="mod1")(modal_1, train)
            out_1b = stem(norm_act, dtype, name="mod1_2")(modal_2, train)
            out_2a = stage("mod2_1", 0, ch[0])(out_1a, train)
            out_2b = stage("mod2_2", 0, ch[0])(out_1b, train)
            out_1 = jnp.concatenate([out_1a, out_1b], axis=-1)
            out_2 = jnp.concatenate([out_2a, out_2b], axis=-1)
        else:
            x_in = (
                modal_1
                if modal_2 is None
                else jnp.concatenate([modal_1, modal_2], axis=-1)
            )
            out_1 = stem(norm_act, dtype, name="mod1")(x_in, train)
            out_2 = stage("mod2_1", 0, ch[0])(out_1, train)

        out_3 = stage("mod3_1", 1, ch[1])(out_2, train)
        out_4 = stage("mod4_1", 2, ch[2])(out_3, train)
        seg5 = stage("mod5_1", 3, ch[3])(out_4, train)

        # The head (bn_out_1 + ASPP + decoder) sits OUTSIDE the stage remat
        # masks, so in training every ASPP branch and FuseModule
        # intermediate at 96x192 is saved for the backward. At the Vistas
        # B=30 operating point those saves are what push the compiled scan
        # step's temp memory to 15.50 GB (peak 15.41, measured via
        # compiled.memory_analysis()) — flush against the 16 GB chip — and
        # force the compiler to spill params/optimizer state to HOST
        # memory: the step's device trace shows the Adam updates and
        # data-grad fusions reading f32 kernels from S(1) at 10-50x their
        # HBM floors (~130 ms of the 617 ms step). HEATNET_REMAT_HEAD=1
        # remats the whole head with the bn-stats policy: intermediates
        # recompute in the backward (one extra head forward, ~20 ms of
        # MXU) and the freed residency keeps params on-chip.
        if self.remat and os.environ.get("HEATNET_REMAT_HEAD", "0") == "1":
            head_fn = nn.remat(ResNeXtSeg._head, static_argnums=(3, 4),
                               policy=BN_STATS_SAVE_POLICY)
        else:
            head_fn = ResNeXtSeg._head
        seg, fusion, seg_cert = head_fn(self, seg5, out_2, train,
                                        forward_decoder)

        # feature taps for the adversarial critics (trgb_segnet.py:399-400)
        skip_down = adaptive_avg_pool(out_2, fusion.shape[1:3])
        inter_f = [
            seg,
            jnp.concatenate([fusion, skip_down], axis=-1),
            out_4,
            out_3,
            out_2,
            out_1,
        ]
        return seg, inter_f, seg_cert

    def _head(self, seg5, out_2, train, forward_decoder):
        """bn_out_1 + ASPP + decoder (+cert) — split out so it can be
        rematted as a unit (HEATNET_REMAT_HEAD); submodule names are
        created in the same scope, so parameter paths are identical to
        the inline form and checkpoints/torch imports are unaffected."""
        norm_act, dtype = self.norm_act, self.dtype
        seg_d = ABN(norm_act, dtype, name="bn_out_1")(seg5, train)

        seg, fusion, seg_cf = ASPP(
            out_channels=self.classes,
            cert_head=True,  # params always exist; used only if cert_branch
            norm_act=norm_act,
            dtype=dtype,
            name="aspp",
        )(seg_d, train)

        seg_cert = None
        if forward_decoder:
            seg = deconv(self.classes, 4, 2, 1, name="up_seg_2", dtype=dtype)(seg)
            seg = FuseModule(self.classes, norm_act, dtype, name="fuse_seg")(
                jnp.concatenate([seg, out_2], axis=-1), train
            )
            if self.cert_branch:
                seg_cert = deconv(1, 4, 2, 1, name="up_seg_2_cert", dtype=dtype)(seg_cf)
                seg_cert = FuseModule(1, norm_act, dtype, name="fuse_seg_cert")(
                    jnp.concatenate([seg_cert, out_2], axis=-1), train
                )
                seg_cert = nn.sigmoid(seg_cert.astype(jnp.float32))
            seg = seg.astype(jnp.float32)
        else:
            seg = None
        return seg, fusion, seg_cert


def net_resnext50(**kw) -> ResNeXtSeg:
    return ResNeXtSeg(structure=(3, 4, 6, 3), **kw)


def net_resnext101(**kw) -> ResNeXtSeg:
    return ResNeXtSeg(structure=(3, 4, 23, 3), **kw)


def net_resnext152(**kw) -> ResNeXtSeg:
    return ResNeXtSeg(structure=(3, 8, 36, 3), **kw)


def tap_channels(classes: int = 13, late_fusion: bool = False) -> list:
    """Channel counts of the 6 critic taps (conf_segnet.py:38-42)."""
    if late_fusion:
        return [classes, 768, 1024, 512, 512, 128]
    return [classes, 512, 1024, 512, 256, 64]
