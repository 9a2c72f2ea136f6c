"""Model registry and factory — the ``build_net.build_network`` equivalent.

Reference: ``/root/reference/models/build_net.py:7-28`` (7 PSPNet backends)
plus the ``net_resnext{50,101,152}`` factories (segnet.py:369-379,
trgb_segnet.py:419-429). The reference loads snapshots inside the factory;
here checkpoint restore is explicit via ``heatnet_tpu.io.checkpoint``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

from .cyclegan import Discriminator, Generator
from .mfnet import MFNet
from .pspnet import PSPNet
from .rtfnet import RTFNet
from .segnet_baseline import SegNetBaseline
from .trgb_segnet import ResNeXtSeg, net_resnext50, net_resnext101, net_resnext152
from .unet import UNetAdapter, UNetSeg

_PSP_BACKENDS = {
    # psp_size per backend (build_net.py:7-16)
    "squeezenet": 512,
    "densenet": 1024,
    "resnet18": 512,
    "resnet34": 512,
    "resnet50": 2048,
    "resnet101": 2048,
    "resnet152": 2048,
}


def build_network(backend: str = "resnet50", n_classes: int = 13,
                  in_channels: int = 3, late_fusion: bool = False,
                  dtype: Any = jnp.float32) -> PSPNet:
    """PSPNet factory, all 7 reference backends (build_net.py:7-28;
    snapshot loading is external)."""
    backend = backend.lower()
    if backend not in _PSP_BACKENDS:
        raise KeyError(f"unknown PSPNet backend {backend}")
    return PSPNet(n_classes=n_classes, psp_size=_PSP_BACKENDS[backend],
                  backend=backend, in_channels=in_channels,
                  late_fusion=late_fusion, dtype=dtype)


MODELS: Dict[str, Callable] = {
    "net_resnext50": net_resnext50,
    "net_resnext101": net_resnext101,
    "net_resnext152": net_resnext152,
    "pspnet": build_network,
    "mfnet": lambda **kw: MFNet(**kw),
    "rtfnet": lambda **kw: RTFNet(**kw),
    "segnet_baseline": lambda **kw: SegNetBaseline(**kw),
    "cyclegan_generator": lambda **kw: Generator(**kw),
    "cyclegan_discriminator": lambda **kw: Discriminator(**kw),
    "unet_adapter": lambda **kw: UNetAdapter(**kw),
    "unet_seg": lambda **kw: UNetSeg(**kw),
}


def get_model(name: str, **kw):
    """Look up a model factory by name (``models.__dict__[args.arch]`` analog,
    scripts/main.py:111)."""
    if name not in MODELS:
        raise KeyError(f"unknown model {name}; available: {sorted(MODELS)}")
    return MODELS[name](**kw)
