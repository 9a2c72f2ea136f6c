"""Adversarial confusion-maximization wrapper: segnet + N critics.

Reference: ``conv_segnet``
(``/root/reference/models/confusion_maximization/models/conf_segnet.py:22-140``):
owns the trgb segnet (ResNeXt or PSPNet), ``num_critics`` critics over the
intermediate feature taps, optional downscale feedback nets (seg logits
concatenated onto each tap), and an optional UNet input adapter with its own
adapter critic. Forward runs the segnet on day and night inputs and every
critic on both tap sets (:106-140).

TPU-native phase handling: the reference flips ``requires_grad`` in-place
(``setPhase``, :90-104). Here the module is pure — phase selection happens in
the trainer via two jitted step functions with optax parameter masking over
the ``trgb_segnet`` vs ``critics`` parameter subtrees (see
``heatnet_tpu.train.adversarial``). The wrapper itself is stateless.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .critics import DownNet, create_critic
from .pspnet import PSPNet, pspnet_tap_channels
from .trgb_segnet import ResNeXtSeg, tap_channels
from .unet import UNetAdapter


class ConfSegnet(nn.Module):
    """Segmentation network + adversarial critics over feature taps."""

    disc_arch: str = "resnet18"
    num_critics: int = 6
    feedback_seg: bool = False
    no_conf: bool = False
    modalities: str = "ir_rgb"
    input_adapter: bool = False
    cert_branch: bool = False
    arch: str = "custom"  # custom (ResNeXt-ASPP) | pspnet
    late_fusion: bool = False
    classes: int = 13
    structure: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32
    remat: bool = False  # checkpoint backbone stages (train memory)
    # reference-BN mode: per-group train-time BN stats emulating
    # nn.DataParallel's per-GPU split (layers.StatNamedBatchNorm);
    # 1 = global-batch stats (the documented default deviation)
    bn_groups: int = 1

    @property
    def num_input_channels(self) -> int:
        n = 0
        if "rgb" in self.modalities:
            n += 3
        if "ir" in self.modalities:
            n += 1
        return n

    def setup(self):
        if self.arch == "custom":
            from .layers import NormAct

            self.trgb_segnet = ResNeXtSeg(
                structure=tuple(self.structure),
                input_channels=self.num_input_channels,
                cert_branch=self.cert_branch,
                late_fusion=self.late_fusion,
                classes=self.classes,
                norm_act=NormAct(bn_groups=self.bn_groups),
                dtype=self.dtype,
                remat=self.remat,
            )
        elif self.arch == "pspnet":
            self.trgb_segnet = PSPNet(
                n_classes=self.classes,
                backend="resnet50",
                in_channels=self.num_input_channels,
                late_fusion=self.late_fusion,
                dtype=self.dtype,
            )
        else:
            raise ValueError(f"unsupported arch {self.arch}")

        if self.input_adapter:
            n_in = self.num_input_channels
            self.input_adapter_net = UNetAdapter(n_in, dtype=self.dtype)
            self.adapter_disc = create_critic(self.disc_arch, self.dtype)

        if not self.no_conf:
            if self.feedback_seg:
                # shrink seg logits to each tap resolution (conf_segnet.py:62-70)
                num_downscale = [3, 3, 3, 2, 2]
                self.downscale_nets = [
                    DownNet(num_downscale[i], dtype=self.dtype)
                    for i in range(len(num_downscale))
                ]
            self.critics = [
                create_critic(self.disc_arch, self.dtype)
                for _ in range(self.num_critics)
            ]

    def _split_modalities(self, inputs):
        """Input list → (modal_1, modal_2) following the trainer's packing."""
        if isinstance(inputs, (list, tuple)):
            if len(inputs) == 2:
                return inputs[0], inputs[1]
            return inputs[0], None
        return inputs, None

    def __call__(self, input_a, input_b, train: bool = False):
        """Dual forward (day=a, night=b). Returns the reference output dict."""
        output = {}
        if self.input_adapter:
            a1, a2 = self._split_modalities(input_a)
            b1, b2 = self._split_modalities(input_b)
            cat_a = a1 if a2 is None else jnp.concatenate([a1, a2], axis=-1)
            cat_b = b1 if b2 is None else jnp.concatenate([b1, b2], axis=-1)
            adapted_a = self.input_adapter_net(cat_a, train)
            adapted_b = self.input_adapter_net(cat_b, train)
            output["input_a"], output["input_b"] = adapted_a, adapted_b
            if a2 is not None:
                n1 = a1.shape[-1]
                input_a = [adapted_a[..., :n1], adapted_a[..., n1:]]
                input_b = [adapted_b[..., :n1], adapted_b[..., n1:]]
            else:
                input_a, input_b = [adapted_a], [adapted_b]

        a1, a2 = self._split_modalities(input_a)
        b1, b2 = self._split_modalities(input_b)
        pred_a, inter_f_a, cert_a = self.trgb_segnet(a1, a2, train)
        pred_b, inter_f_b, cert_b = self.trgb_segnet(b1, b2, train)
        inter_f_a, inter_f_b = list(inter_f_a), list(inter_f_b)

        if not self.no_conf:
            output["critics_a"], output["critics_b"] = [], []
            for i, critic in enumerate(self.critics):
                tap_a, tap_b = inter_f_a[i], inter_f_b[i]
                if self.feedback_seg and i > 0:
                    tap_a = jnp.concatenate(
                        [tap_a, self.downscale_nets[i - 1](pred_a, train)], axis=-1)
                    tap_b = jnp.concatenate(
                        [tap_b, self.downscale_nets[i - 1](pred_b, train)], axis=-1)
                output["critics_a"].append(critic(tap_a, train=train))
                output["critics_b"].append(critic(tap_b, train=train))
            if self.input_adapter:
                # the reference scores the adapter's OUTPUT (forward
                # reassigns input_a = input_adapter_net(input_a) before
                # adapter_disc(input_a), conf_segnet.py:108-132) — scoring
                # the raw input would give the adapter zero gradient
                # through its critic
                output["critics_a"].append(
                    self.adapter_disc(adapted_a, train=train))
                output["critics_b"].append(
                    self.adapter_disc(adapted_b, train=train))

        output["pred_label_a"] = pred_a
        output["pred_label_b"] = pred_b
        output["cert_a"] = cert_a
        output["cert_b"] = cert_b
        output["inter_f_b"] = inter_f_b
        return output

    def critic_taps(self) -> List[int]:
        if self.arch == "pspnet":
            chans = pspnet_tap_channels("resnet50", self.classes, self.late_fusion)
        else:
            chans = tap_channels(self.classes, self.late_fusion)
        return chans[: self.num_critics]
