"""Golden numerical-equivalence tests against the torch reference models.

The north star (BASELINE.md) demands val mIoU within 0.5 pts of the
reference checkpoint; that requires the converted networks to be
numerically equivalent layer-for-layer. These tests instantiate the actual
reference definitions (torch CPU) from /root/reference with random weights
and randomized BatchNorm running statistics, convert the state_dict with
``heatnet_tpu.io.torch_import``, and assert that the flax forward pass
matches the torch forward pass at eval semantics.

Covers (VERDICT round-1 item 3): trgb_segnet early fusion, late fusion,
cert branch (``trgb_segnet.py:242-416``, output tuple :399-402), and the
Vistas segnet 7x7-stem variant (``segnet.py:224-379``). The conversion-hit
assertion guarantees every target parameter was actually imported — a
naming miss silently comparing random weights cannot pass.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference/models"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available")

torch = pytest.importorskip("torch")


def _load_ref_package(alias: str, path: str):
    """Register a reference directory as an importable package."""
    if alias in sys.modules:
        return sys.modules[alias]
    pkg = types.ModuleType(alias)
    pkg.__path__ = [path]
    sys.modules[alias] = pkg
    return pkg


def _ref_trgb():
    _load_ref_package("_ref_conf_models",
                      os.path.join(REFERENCE, "confusion_maximization",
                                   "models"))
    return importlib.import_module("_ref_conf_models.trgb_segnet")


def _ref_segnet():
    _load_ref_package("_ref_models", REFERENCE)
    return importlib.import_module("_ref_models.segnet")


def _stub_torchvision():
    """extractors.py imports torchvision's densenet/squeezenet constructors
    at module scope; stub them (only called for those backends)."""
    if "torchvision" in sys.modules:
        return

    def _unavailable(*a, **k):
        raise RuntimeError("torchvision stub: pretrained nets unavailable")

    tv = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    dn = types.ModuleType("torchvision.models.densenet")
    dn.densenet121 = dn.densenet161 = _unavailable
    sq = types.ModuleType("torchvision.models.squeezenet")
    sq.squeezenet1_1 = _unavailable
    tv.models = tv_models
    tv_models.densenet = dn
    tv_models.squeezenet = sq
    sys.modules.update({"torchvision": tv, "torchvision.models": tv_models,
                        "torchvision.models.densenet": dn,
                        "torchvision.models.squeezenet": sq})


def _ref_pspnet():
    """Import the reference PSPNet; it does ``import models.extractors`` so
    the confusion_maximization/models dir must be importable as ``models``."""
    _stub_torchvision()
    path = os.path.join(REFERENCE, "confusion_maximization", "models")
    if "models" not in sys.modules or not getattr(
            sys.modules["models"], "__path__", [None])[0] == path:
        pkg = types.ModuleType("models")
        pkg.__path__ = [path]
        sys.modules["models"] = pkg
    return importlib.import_module("models.pspnet")


def _randomize_bn_stats(model: "torch.nn.Module", seed: int = 7) -> None:
    """Non-trivial running stats + affine so BN conversion is truly tested."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                             generator=g) * 0.1)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=g) + 0.5)
            if m.weight is not None:
                m.weight.data.copy_(
                    torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)


def _convert_full(model_t, params, batch_stats, allowed_missing=()):
    """Convert + import, asserting every target leaf (minus allowed) is hit."""
    from heatnet_tpu.io.checkpoint import _flatten, _shape_ok
    from heatnet_tpu.io.torch_import import convert_state_dict, import_into

    sd = model_t.state_dict()
    p_flat, s_flat = convert_state_dict(sd)

    missing_p = [k for k, v in _flatten(params).items()
                 if not (k in p_flat and _shape_ok(p_flat[k], v))
                 and not any(k.startswith(a) for a in allowed_missing)]
    assert not missing_p, f"unconverted params: {missing_p[:8]}"
    if batch_stats is not None:
        missing_s = [k for k, v in _flatten(batch_stats).items()
                     if not (k in s_flat and _shape_ok(s_flat[k], v))
                     and not any(k.startswith(a) for a in allowed_missing)]
        assert not missing_s, f"unconverted batch_stats: {missing_s[:8]}"

    return import_into(params, batch_stats, sd)


def _jax_variables(model_j, example_inputs):
    import jax

    from heatnet_tpu.train.state import init_model

    params, batch_stats = init_model(
        model_j, jax.random.PRNGKey(0), *example_inputs,
        init_kwargs={"train": True})
    return params, batch_stats


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        np.moveaxis(x_nhwc, -1, 1)))


def _to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


@pytest.mark.slow
@pytest.mark.parametrize("late_fusion,cert_branch", [
    (False, False),
    (False, True),
    (True, False),
])
def test_trgb_segnet_forward_parity(late_fusion, cert_branch):
    import jax.numpy as jnp

    from heatnet_tpu.models import ResNeXtSeg

    ref = _ref_trgb()
    torch.manual_seed(0)
    model_t = ref.ResNeXt(structure=[1, 1, 1, 1], input_channels=4,
                          cert_branch=cert_branch, late_fusion=late_fusion)
    model_t.eval()
    _randomize_bn_stats(model_t)

    model_j = ResNeXtSeg(structure=(1, 1, 1, 1), input_channels=4,
                         cert_branch=cert_branch, late_fusion=late_fusion,
                         dtype=jnp.float32)
    rgb = np.random.RandomState(1).rand(2, 64, 128, 3).astype(np.float32)
    ir = np.random.RandomState(2).rand(2, 64, 128, 1).astype(np.float32)

    params, batch_stats = _jax_variables(model_j, [jnp.asarray(rgb),
                                                   jnp.asarray(ir)])
    # reference-only heads never forwarded: bn_out_2/up_borders_3/up_inst_2
    # exist in the torch module but not ours; cert heads exist in ours
    # (params always materialized) but not in torch unless cert_branch.
    allowed = () if cert_branch else ("up_seg_2_cert", "fuse_seg_cert")
    params, batch_stats = _convert_full(model_t, params, batch_stats,
                                        allowed_missing=allowed)

    with torch.no_grad():
        seg_t, taps_t, cert_t = model_t(_nchw(rgb), _nchw(ir))

    variables = {"params": params, "batch_stats": batch_stats}
    seg_j, taps_j, cert_j = model_j.apply(variables, jnp.asarray(rgb),
                                          jnp.asarray(ir), train=False)

    np.testing.assert_allclose(np.asarray(seg_j), _to_nhwc(seg_t),
                               rtol=1e-3, atol=2e-3)
    for i, (tj, tt) in enumerate(zip(taps_j, taps_t)):
        np.testing.assert_allclose(
            np.asarray(tj), _to_nhwc(tt), rtol=1e-3, atol=2e-3,
            err_msg=f"critic tap {i} diverges")
    if cert_branch:
        np.testing.assert_allclose(np.asarray(cert_j), _to_nhwc(cert_t),
                                   rtol=1e-3, atol=2e-3)
    else:
        assert cert_j is None and cert_t is None


@pytest.mark.slow
def test_vistas_segnet_forward_parity():
    import jax.numpy as jnp

    from heatnet_tpu.models import ResNeXtSeg

    ref = _ref_segnet()
    torch.manual_seed(0)
    model_t = ref.ResNeXt(structure=[1, 1, 1, 1], input_3x3=False, classes=14)
    model_t.eval()
    _randomize_bn_stats(model_t)

    model_j = ResNeXtSeg(structure=(1, 1, 1, 1), input_channels=3,
                         classes=14, input_3x3=False, dtype=jnp.float32)
    img = np.random.RandomState(3).rand(2, 64, 128, 3).astype(np.float32)

    params, batch_stats = _jax_variables(model_j, [jnp.asarray(img)])
    # Vistas reference ASPP has no final_conv2/cert heads (segnet.py:128-172)
    allowed = ("aspp/final_conv2", "up_seg_2_cert", "fuse_seg_cert")
    params, batch_stats = _convert_full(model_t, params, batch_stats,
                                        allowed_missing=allowed)

    with torch.no_grad():
        seg_t = model_t(_nchw(img))

    variables = {"params": params, "batch_stats": batch_stats}
    seg_j, _taps, _cert = model_j.apply(variables, jnp.asarray(img),
                                        train=False)
    np.testing.assert_allclose(np.asarray(seg_j), _to_nhwc(seg_t),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.slow
@pytest.mark.parametrize("backend,psp_size,late_fusion", [
    ("resnet18", 512, False),
    ("resnet50", 2048, False),
    ("resnet50", 2048, True),
])
def test_pspnet_forward_parity(backend, psp_size, late_fusion):
    """PSPNet + dilated-ResNet extractor vs the torch reference
    (pspnet.py:43-76, extractors.py:105-200, build_net.py:7-18 configs)."""
    import jax.numpy as jnp

    from heatnet_tpu.models.pspnet import PSPNet

    ref = _ref_pspnet()
    ext = importlib.import_module("models.extractors")
    if backend != "resnet50":
        # reference defect: PSPNet passes late_fusion/in_channels to every
        # backend factory but only resnet50's accepts them
        # (extractors.py:376-408) — shim the signature for the test.
        layers = {"resnet18": ([2, 2, 2, 2], ext.BasicBlock)}[backend]
        setattr(ext, backend,
                lambda pretrained, late_fusion=False, in_channels=3:
                ext.ResNet(layers[1], layers[0], late_fusion, in_channels))
    torch.manual_seed(0)
    in_ch = 4 if late_fusion else 3
    model_t = ref.PSPNet(n_classes=13, psp_size=psp_size, backend=backend,
                         pretrained=False, late_fusion=late_fusion,
                         in_channels=in_ch)
    model_t.eval()
    _randomize_bn_stats(model_t)

    model_j = PSPNet(n_classes=13, psp_size=psp_size, backend=backend,
                     late_fusion=late_fusion, in_channels=in_ch,
                     dtype=jnp.float32)
    rgb = np.random.RandomState(6).rand(2, 64, 128, 3).astype(np.float32)
    ir = np.random.RandomState(7).rand(2, 64, 128, 1).astype(np.float32)
    if late_fusion:
        inputs_j = [jnp.asarray(rgb), jnp.asarray(ir)]
        inputs_t = (_nchw(rgb), _nchw(ir))
    else:
        inputs_j = [jnp.asarray(rgb)]
        inputs_t = (_nchw(rgb),)

    params, batch_stats = _jax_variables(model_j, inputs_j)
    params, batch_stats = _convert_full(model_t, params, batch_stats)

    with torch.no_grad():
        out_t, taps_t, _ = model_t(*inputs_t)

    variables = {"params": params, "batch_stats": batch_stats}
    out_j, taps_j, _ = model_j.apply(variables, *inputs_j, train=False)

    np.testing.assert_allclose(np.asarray(out_j), _to_nhwc(out_t),
                               rtol=1e-3, atol=2e-3)
    for i, (tj, tt) in enumerate(zip(taps_j, taps_t)):
        np.testing.assert_allclose(
            np.asarray(tj), _to_nhwc(tt), rtol=3e-3, atol=5e-3,
            err_msg=f"pspnet tap {i} diverges")


@pytest.mark.slow
def test_squeezenet_extractor_forward_parity():
    """SqueezeNet extractor vs the torch reference (extractors.py:330-360).

    Only the extractor is comparable: the reference returns (f4, f3) and
    its own PSPNet forward then indexes 5 taps, so the full reference
    PSPNet-squeezenet stack crashes (reference defect). We assert our
    taps[0]/taps[1] match the reference f4/f3.
    """
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.models.extractors import SqueezeNetExtractor
    from heatnet_tpu.train.state import init_model

    _ref_pspnet()  # registers the "models" package + torchvision stub
    ext = importlib.import_module("models.extractors")
    torch.manual_seed(0)
    model_t = ext.SqueezeNet(pretrained=False).eval()

    model_j = SqueezeNetExtractor(dtype=jnp.float32)
    img = np.random.RandomState(8).rand(2, 64, 128, 3).astype(np.float32)
    params, batch_stats = init_model(model_j, jax.random.PRNGKey(0),
                                     jnp.asarray(img),
                                     init_kwargs={"train": True})
    assert batch_stats is None or not batch_stats  # squeezenet has no BN
    params, _ = _convert_full(model_t, params, None)

    with torch.no_grad():
        f4_t, f3_t = model_t(_nchw(img))

    taps = model_j.apply({"params": params}, jnp.asarray(img), train=False)
    np.testing.assert_allclose(np.asarray(taps[0]), _to_nhwc(f4_t),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(taps[1]), _to_nhwc(f3_t),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_densenet_extractor_forward_parity():
    """DenseNet extractor vs the actual torch definition
    (extractors.py:203-300) — upgrades the last shape-only parity row
    (VERDICT r2 item 9).

    The reference class can't instantiate under the installed stack for
    TWO reasons: it calls ``densenet121(pretrained=True)`` unconditionally
    at construction (:266-270), and its ``_DenseLayer`` uses the
    old-torchvision dotted module names ``norm.1``/``conv.2`` (:209-216)
    that torch 2.x's ``add_module`` rejects outright. So: stub
    torchvision's densenet121 with a net assembled from the reference's
    OWN _DenseBlock/_Transition classes (the RTFNet pattern), and swap
    ``_DenseLayer`` for a line-identical twin whose module names drop the
    dots (a pure state_dict-naming detail — order and math unchanged).
    Compared: the 2-tuple the reference returns — ``out`` (denseblock4)
    and ``deep_features`` (transition3) — against our taps[0]/taps[1]."""
    from collections import OrderedDict

    import jax
    import jax.numpy as jnp

    from heatnet_tpu.models.extractors import DenseNetExtractor
    from heatnet_tpu.train.state import init_model

    _ref_pspnet()  # registers the "models" package + torchvision stub
    ext = importlib.import_module("models.extractors")

    class _DenseLayerDotFree(torch.nn.Sequential):
        """extractors.py:205-223 with dot-free names (torch 2.x rejects
        'norm.1'); same module order, same forward."""

        def __init__(self, num_input_features, growth_rate, bn_size,
                     drop_rate):
            super().__init__()
            self.add_module("norm1",
                            torch.nn.BatchNorm2d(num_input_features))
            self.add_module("relu1", torch.nn.ReLU(inplace=True))
            self.add_module("conv1", torch.nn.Conv2d(
                num_input_features, bn_size * growth_rate, kernel_size=1,
                stride=1, bias=False))
            self.add_module("norm2",
                            torch.nn.BatchNorm2d(bn_size * growth_rate))
            self.add_module("relu2", torch.nn.ReLU(inplace=True))
            self.add_module("conv2", torch.nn.Conv2d(
                bn_size * growth_rate, growth_rate, kernel_size=3,
                stride=1, padding=1, bias=False))
            self.drop_rate = drop_rate

        def forward(self, x):
            new_features = super().forward(x)
            if self.drop_rate > 0:
                new_features = torch.nn.functional.dropout(
                    new_features, p=self.drop_rate, training=self.training)
            return torch.cat([x, new_features], 1)

    def fake_densenet121(pretrained=True):
        torch.manual_seed(3)
        holder = torch.nn.Module()
        holder.features = torch.nn.Sequential(OrderedDict([
            ("conv0", torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)),
            ("norm0", torch.nn.BatchNorm2d(64)),
            ("relu0", torch.nn.ReLU(inplace=True)),
            ("pool0", torch.nn.MaxPool2d(3, 2, 1)),
            ("denseblock1", ext._DenseBlock(6, 64, 4, 32, 0)),
            ("transition1", ext._Transition(256, 128)),
            ("denseblock2", ext._DenseBlock(12, 128, 4, 32, 0)),
            ("transition2", ext._Transition(512, 256)),
            ("denseblock3", ext._DenseBlock(24, 256, 4, 32, 0)),
            ("transition3", ext._Transition(1024, 512)),
            ("denseblock4", ext._DenseBlock(16, 512, 4, 32, 0)),
        ]))
        return holder

    orig, orig_layer = ext.densenet121, ext._DenseLayer
    ext.densenet121, ext._DenseLayer = fake_densenet121, _DenseLayerDotFree
    try:
        torch.manual_seed(0)
        model_t = ext.DenseNet(pretrained=True).eval()
    finally:
        ext.densenet121, ext._DenseLayer = orig, orig_layer
    _randomize_bn_stats(model_t)

    model_j = DenseNetExtractor(dtype=jnp.float32)
    img = np.random.RandomState(11).rand(1, 64, 128, 3).astype(np.float32)
    params, batch_stats = init_model(model_j, jax.random.PRNGKey(0),
                                     jnp.asarray(img),
                                     init_kwargs={"train": True})
    params, batch_stats = _convert_full(model_t, params, batch_stats)

    with torch.no_grad():
        out_t, deep_t = model_t(_nchw(img))

    taps = model_j.apply({"params": params, "batch_stats": batch_stats},
                         jnp.asarray(img), train=False)
    np.testing.assert_allclose(np.asarray(taps[0]), _to_nhwc(out_t),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(taps[1]), _to_nhwc(deep_t),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_trgb_segnet_resnext50_full_depth_parity():
    """Full ResNeXt-50 stack at a small eval shape (the flagship config)."""
    import jax.numpy as jnp

    from heatnet_tpu.models import ResNeXtSeg

    ref = _ref_trgb()
    torch.manual_seed(0)
    model_t = ref.ResNeXt(structure=[3, 4, 6, 3], input_channels=4)
    model_t.eval()
    _randomize_bn_stats(model_t)

    model_j = ResNeXtSeg(structure=(3, 4, 6, 3), input_channels=4,
                         dtype=jnp.float32)
    rgb = np.random.RandomState(4).rand(1, 64, 128, 3).astype(np.float32)
    ir = np.random.RandomState(5).rand(1, 64, 128, 1).astype(np.float32)

    params, batch_stats = _jax_variables(model_j, [jnp.asarray(rgb),
                                                   jnp.asarray(ir)])
    params, batch_stats = _convert_full(
        model_t, params, batch_stats,
        allowed_missing=("up_seg_2_cert", "fuse_seg_cert"))

    with torch.no_grad():
        seg_t, _, _ = model_t(_nchw(rgb), _nchw(ir))

    variables = {"params": params, "batch_stats": batch_stats}
    seg_j, _, _ = model_j.apply(variables, jnp.asarray(rgb), jnp.asarray(ir),
                                train=False)
    np.testing.assert_allclose(np.asarray(seg_j), _to_nhwc(seg_t),
                               rtol=1e-3, atol=5e-3)


def _ref_conf(path_rel):
    """Import a confusion_maximization module by filename."""
    import importlib.util

    full = os.path.join(REFERENCE, "confusion_maximization", path_rel)
    name = "_refcm_" + os.path.splitext(os.path.basename(path_rel))[0]
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, full)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_fcdiscriminator_forward_parity():
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.io.torch_import import import_into
    from heatnet_tpu.models.critics import FCDiscriminator
    from heatnet_tpu.train.state import init_model

    ref = _ref_conf("discriminator_model.py")
    torch.manual_seed(0)
    model_t = ref.FCDiscriminator(num_classes=13).eval()

    model_j = FCDiscriminator(dtype=jnp.float32)
    x = np.random.RandomState(1).rand(2, 64, 128, 13).astype(np.float32)
    params, _ = init_model(model_j, jax.random.PRNGKey(0), jnp.asarray(x))
    params, _ = import_into(params, None, model_t.state_dict())

    with torch.no_grad():
        y_t = model_t(_nchw(x))
    y_j = model_j.apply({"params": params}, jnp.asarray(x))
    # upsample conventions differ (fixed x32 vs to-input-size are identical
    # on stride-aligned inputs; bilinear half-pixel matches align_corners
    # None/False)
    np.testing.assert_allclose(np.asarray(y_j), _to_nhwc(y_t),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_pool_discriminator_forward_parity():
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.io.torch_import import PATCHGAN_DISC_RENAMES, import_into
    from heatnet_tpu.models.critics import PoolDiscriminator
    from heatnet_tpu.train.state import init_model

    ref = _ref_conf("discriminator_model.py")
    torch.manual_seed(0)
    model_t = ref.Discriminator(input_nc=13).eval()

    model_j = PoolDiscriminator(dtype=jnp.float32)
    x = np.random.RandomState(2).rand(2, 64, 128, 13).astype(np.float32)
    params, _ = init_model(model_j, jax.random.PRNGKey(0), jnp.asarray(x))
    params, _ = import_into(params, None, model_t.state_dict(),
                            rename_map=PATCHGAN_DISC_RENAMES)

    with torch.no_grad():
        y_t = model_t(_nchw(x))
    y_j = model_j.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_downnet_forward_parity():
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.io.torch_import import downnet_renames, import_into
    from heatnet_tpu.models.critics import DownNet
    from heatnet_tpu.train.state import init_model

    ref = _ref_conf("models/downscale_network.py")
    torch.manual_seed(0)
    model_t = ref.DownNet(downsampling=3, channels=12).eval()

    model_j = DownNet(downsampling=3, dtype=jnp.float32)
    x = np.random.RandomState(3).rand(2, 64, 128, 12).astype(np.float32)
    params, _ = init_model(model_j, jax.random.PRNGKey(0), jnp.asarray(x))
    params, _ = import_into(params, None, model_t.state_dict(),
                            rename_map=downnet_renames(3))

    with torch.no_grad():
        y_t = model_t(_nchw(x))
    y_j = model_j.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_j), _to_nhwc(y_t),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_unet_adapter_forward_parity():
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.io.torch_import import import_into, unet_adapter_renames
    from heatnet_tpu.models.unet import UNetAdapter
    from heatnet_tpu.train.state import init_model

    ref = _ref_conf("models/input_adapter.py")
    torch.manual_seed(0)
    model_t = ref.UNet(n_channels=4, n_classes=4).eval()
    _randomize_bn_stats(model_t)

    model_j = UNetAdapter(n_classes=4, dtype=jnp.float32)
    x = np.random.RandomState(4).rand(2, 64, 128, 4).astype(np.float32)
    params, batch_stats = init_model(model_j, jax.random.PRNGKey(0),
                                     jnp.asarray(x),
                                     init_kwargs={"train": True})
    params, batch_stats = import_into(params, batch_stats,
                                      model_t.state_dict(),
                                      rename_map=unet_adapter_renames())

    with torch.no_grad():
        y_t = model_t(_nchw(x))
    y_j = model_j.apply({"params": params, "batch_stats": batch_stats},
                        jnp.asarray(x), train=False)
    # reference Up uses align_corners=True upsampling; ours half-pixel —
    # interior pixels match, so compare with a slightly relaxed tolerance
    # over the central crop
    yj = np.asarray(y_j)[:, 4:-4, 4:-4]
    yt = _to_nhwc(y_t)[:, 4:-4, 4:-4]
    np.testing.assert_allclose(yj, yt, rtol=5e-2, atol=5e-2)


@pytest.mark.slow
def test_cyclegan_generator_forward_parity():
    import importlib.util
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.io.torch_import import (cyclegan_generator_renames,
                                             import_into)
    from heatnet_tpu.models.cyclegan import Generator
    from heatnet_tpu.train.state import init_model

    spec = importlib.util.spec_from_file_location(
        "_ref_cyclegan_models",
        os.path.join(REFERENCE, "cyclegan", "models.py"))
    ref = importlib.util.module_from_spec(spec)
    sys.modules["_ref_cyclegan_models"] = ref
    spec.loader.exec_module(ref)

    torch.manual_seed(0)
    model_t = ref.Generator(input_nc=1, output_nc=1, n_residual_blocks=3).eval()

    model_j = Generator(output_nc=1, n_residual_blocks=3, dtype=jnp.float32)
    x = np.random.RandomState(5).rand(2, 64, 64, 1).astype(np.float32)
    params, _ = init_model(model_j, jax.random.PRNGKey(0), jnp.asarray(x))
    params, _ = import_into(params, None, model_t.state_dict(),
                            rename_map=cyclegan_generator_renames(3))

    with torch.no_grad():
        y_t = model_t(_nchw(x))
    y_j = model_j.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_j), _to_nhwc(y_t),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_mfnet_forward_parity():
    import importlib.util
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.io.torch_import import import_into
    from heatnet_tpu.models import MFNet
    from heatnet_tpu.train.state import init_model

    spec = importlib.util.spec_from_file_location(
        "_ref_mfnet",
        os.path.join(REFERENCE, "external_models", "mfnet", "model",
                     "MFNet.py"))
    ref = importlib.util.module_from_spec(spec)
    sys.modules["_ref_mfnet"] = ref
    spec.loader.exec_module(ref)

    torch.manual_seed(0)
    model_t = ref.MFNet(n_class=9).eval()
    _randomize_bn_stats(model_t)

    model_j = MFNet(n_class=9, dtype=jnp.float32)
    x = np.random.RandomState(6).rand(2, 64, 96, 4).astype(np.float32)
    params, batch_stats = init_model(model_j, jax.random.PRNGKey(0),
                                     jnp.asarray(x),
                                     init_kwargs={"train": True})
    params, batch_stats = _convert_full(model_t, params, batch_stats)

    with torch.no_grad():
        y_t = model_t(_nchw(x))
    y_j = model_j.apply({"params": params, "batch_stats": batch_stats},
                        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y_j), _to_nhwc(y_t),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_critic_resnet_forward_parity():
    """ResNet classifier critic (critic_resnet.py:122-226) vs our
    extractor in classifier mode."""
    import importlib.util
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.io.torch_import import import_into
    from heatnet_tpu.models.extractors import make_resnet
    from heatnet_tpu.train.state import init_model

    _stub_torchvision()
    # critic_resnet imports load_state_dict_from_url from torchvision
    tv_resnet = types.ModuleType("torchvision.models.resnet")
    tv_resnet.load_state_dict_from_url = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("stub"))
    sys.modules["torchvision.models.resnet"] = tv_resnet
    sys.modules["torchvision.models"].resnet = tv_resnet

    spec = importlib.util.spec_from_file_location(
        "_ref_critic_resnet",
        os.path.join(REFERENCE, "confusion_maximization", "models",
                     "critic_resnet.py"))
    ref = importlib.util.module_from_spec(spec)
    sys.modules["_ref_critic_resnet"] = ref
    spec.loader.exec_module(ref)

    torch.manual_seed(0)
    model_t = ref.resnet18(pretrained=False, input_maps=13,
                           num_classes=1).eval()
    _randomize_bn_stats(model_t)

    model_j = make_resnet("resnet18", in_channels=13, num_classes=1,
                          dtype=jnp.float32)
    x = np.random.RandomState(7).rand(2, 64, 128, 13).astype(np.float32)
    params, batch_stats = init_model(model_j, jax.random.PRNGKey(0),
                                     jnp.asarray(x),
                                     init_kwargs={"train": True})
    params, batch_stats = import_into(params, batch_stats,
                                      model_t.state_dict())

    with torch.no_grad():
        y_t = model_t(_nchw(x))
    y_j = model_j.apply({"params": params, "batch_stats": batch_stats},
                        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y_j), y_t.numpy(),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_segnetsplit_encoder_decoder_parity():
    """Uncertainty pretrainer nets (segnetsplit.py:240-413): encoder
    (aspp_out, out_4) and decoder (2x deconv + fuseModule2) vs torch."""
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.io.torch_import import import_into
    from heatnet_tpu.models.segnetsplit import ResNeXtDecoder, ResNeXtEncoder
    from heatnet_tpu.train.state import init_model

    _load_ref_package("_ref_conf_models",
                      os.path.join(REFERENCE, "confusion_maximization",
                                   "models"))
    ref = importlib.import_module("_ref_conf_models.segnetsplit")

    torch.manual_seed(0)
    enc_t = ref.ResNeXtEncoder(structure=[1, 1, 1, 1], classes=12,
                               in_channels=1).eval()
    dec_t = ref.ResNeXtDecoder(out_classes=12,
                               last_activation=torch.nn.Identity()).eval()
    _randomize_bn_stats(enc_t)
    _randomize_bn_stats(dec_t, seed=9)

    enc_j = ResNeXtEncoder(structure=(1, 1, 1, 1), classes=12, in_channels=1,
                           dtype=jnp.float32)
    dec_j = ResNeXtDecoder(out_classes=12, dtype=jnp.float32)

    x = np.random.RandomState(9).rand(1, 64, 128, 1).astype(np.float32)
    e_params, e_bs = init_model(enc_j, jax.random.PRNGKey(0), jnp.asarray(x),
                                init_kwargs={"train": True})
    e_params, e_bs = import_into(e_params, e_bs, enc_t.state_dict())

    with torch.no_grad():
        seg_t, out4_t = enc_t(_nchw(x))
    seg_j, out4_j = enc_j.apply({"params": e_params, "batch_stats": e_bs},
                                jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(seg_j), _to_nhwc(seg_t),
                               rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out4_j), _to_nhwc(out4_t),
                               rtol=1e-3, atol=2e-3)

    d_params, d_bs = init_model(dec_j, jax.random.PRNGKey(1),
                                jnp.asarray(np.asarray(seg_j)),
                                jnp.asarray(np.asarray(out4_j)),
                                init_kwargs={"train": True})
    d_params, d_bs = import_into(d_params, d_bs, dec_t.state_dict())
    with torch.no_grad():
        dec_out_t = dec_t(seg_t, out4_t)
    dec_out_j = dec_j.apply({"params": d_params, "batch_stats": d_bs},
                            jnp.asarray(np.asarray(seg_j)),
                            jnp.asarray(np.asarray(out4_j)), train=False)
    np.testing.assert_allclose(np.asarray(dec_out_j), _to_nhwc(dec_out_t),
                               rtol=1e-3, atol=2e-3)


@pytest.mark.slow
def test_rtfnet_forward_parity():
    """RTFNet (RTFNet.py:13-238) vs torch. torchvision is stubbed with the
    reference's own critic_resnet (a faithful torchvision-ResNet copy), so
    the encoders get the real block structure without network access."""
    import importlib.util
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.io.torch_import import import_into, rtfnet_transpose_paths
    from heatnet_tpu.models import RTFNet
    from heatnet_tpu.train.state import init_model

    _stub_torchvision()
    tv_resnet = sys.modules.get("torchvision.models.resnet")
    if tv_resnet is None:
        tv_resnet = types.ModuleType("torchvision.models.resnet")
        sys.modules["torchvision.models.resnet"] = tv_resnet
    tv_resnet.load_state_dict_from_url = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("stub"))
    sys.modules["torchvision.models"].resnet = tv_resnet

    spec = importlib.util.spec_from_file_location(
        "_ref_critic_resnet2",
        os.path.join(REFERENCE, "confusion_maximization", "models",
                     "critic_resnet.py"))
    cr = importlib.util.module_from_spec(spec)
    sys.modules["_ref_critic_resnet2"] = cr
    spec.loader.exec_module(cr)
    tv_models = sys.modules["torchvision.models"]
    tv_models.resnet50 = lambda pretrained=False, **k: cr.resnet50(
        pretrained=False)

    spec = importlib.util.spec_from_file_location(
        "_ref_rtfnet",
        os.path.join(REFERENCE, "external_models", "rtfnet", "model",
                     "RTFNet.py"))
    ref = importlib.util.module_from_spec(spec)
    sys.modules["_ref_rtfnet"] = ref
    spec.loader.exec_module(ref)

    torch.manual_seed(0)
    model_t = ref.RTFNet(n_class=9).eval()
    _randomize_bn_stats(model_t)

    model_j = RTFNet(n_class=9, dtype=jnp.float32)
    x = np.random.RandomState(10).rand(1, 64, 96, 4).astype(np.float32)
    params, batch_stats = init_model(model_j, jax.random.PRNGKey(0),
                                     jnp.asarray(x),
                                     init_kwargs={"train": True})
    from heatnet_tpu.io.checkpoint import _flatten, _shape_ok
    from heatnet_tpu.io.torch_import import convert_state_dict

    sd = model_t.state_dict()
    p_flat, s_flat = convert_state_dict(
        sd, transpose_paths=rtfnet_transpose_paths())
    missing = [k for k, v in _flatten(params).items()
               if not (k in p_flat and _shape_ok(p_flat[k], v))]
    assert not missing, f"unconverted RTFNet params: {missing[:8]}"
    params, batch_stats = import_into(
        params, batch_stats, sd, transpose_paths=rtfnet_transpose_paths())

    with torch.no_grad():
        y_t = model_t(_nchw(x))
    y_j = model_j.apply({"params": params, "batch_stats": batch_stats},
                        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y_j), _to_nhwc(y_t),
                               rtol=2e-3, atol=3e-3)


@pytest.mark.slow
def test_miou_parity_end_to_end():
    """North-star leg 2, end to end: the SAME weights evaluated through the
    reference protocol (torch forward + utils.calculate_ious, :134-163) and
    through ours (raw-dtype loader → device normalize → validate_model)
    must produce the SAME per-class IoUs on the same frames."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from heatnet_tpu.data.loaders import (FreiburgThermalTestDataset,
                                          get_test_paths)
    from heatnet_tpu.data.synthetic import make_freiburg_test
    from heatnet_tpu.eval.validate import validate_model
    from heatnet_tpu.models import ResNeXtSeg

    ref = _ref_trgb()
    torch.manual_seed(0)
    model_t = ref.ResNeXt(structure=[1, 1, 1, 1], input_channels=4).eval()
    _randomize_bn_stats(model_t)

    model_j = ResNeXtSeg(structure=(1, 1, 1, 1), input_channels=4,
                         dtype=jnp.float32)
    params, batch_stats = _jax_variables(
        model_j, [jnp.zeros((1, 320, 704, 3)), jnp.zeros((1, 320, 704, 1))])
    params, batch_stats = _convert_full(
        model_t, params, batch_stats,
        allowed_missing=("up_seg_2_cert", "fuse_seg_cert"))

    with tempfile.TemporaryDirectory() as d:
        root = make_freiburg_test(os.path.join(d, "fr"), n=3)
        ds = FreiburgThermalTestDataset(*get_test_paths([root]))

        # ours: the full eval path (uint8/uint16 loader, fused normalize)
        variables = {"params": params, "batch_stats": batch_stats}
        ours = validate_model(model_j, variables,
                              (ds[i] for i in range(len(ds))), "ir_rgb")

        # reference protocol: torch forward on identically-normalized
        # inputs + utils.calculate_ious over the accumulated maps
        utils_mod = _ref_conf("utils.py")
        preds, gts = [], []
        for i in range(len(ds)):
            item = ds[i]
            rgb = (item["rgb"].astype(np.float32) / 255.0 - 0.5) / 0.5
            ir16 = item["ir"].astype(np.float32)
            ir = (np.clip(ir16, 21800, 25000) - 21800) / 3200.0
            ir = (ir - 0.5) / 0.5
            with torch.no_grad():
                seg, _, _ = model_t(_nchw(rgb[0][None]), _nchw(ir[0][None]))
            preds.append(seg.argmax(1))
            gts.append(torch.from_numpy(item["label"].astype(np.int64)))
        theirs = utils_mod.calculate_ious(torch.cat(preds), torch.cat(gts))

    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7,
                               err_msg="per-class IoUs diverge between "
                                       "reference and heatnet_tpu eval")
    assert np.isclose(np.nanmean(ours), np.nanmean(theirs))


def test_convert_checkpoint_cli_migration(tmp_path):
    """The reference user's migration path, end to end: a torch .pth.tar
    saved the reference way (torch.save({'state_dict': module.-prefixed}),
    scripts/main.py:321-324) converted by the CLI into an orbax checkpoint
    that --resume loads, with forward parity against the torch model."""
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.cli.convert_checkpoint import main as convert_main
    from heatnet_tpu.io.checkpoint import load_checkpoint, restore_partial
    from heatnet_tpu.models import ResNeXtSeg

    ref = _ref_trgb()
    torch.manual_seed(3)
    model_t = ref.ResNeXt(structure=[1, 1, 1, 1], input_channels=4).eval()
    _randomize_bn_stats(model_t)

    # save it as the reference trainers do: DataParallel 'module.' prefix
    pth = os.path.join(tmp_path, "ref_ckpt.pth.tar")
    sd = {"module." + k: v for k, v in model_t.state_dict().items()}
    torch.save({"epoch": 3, "state_dict": sd, "best_iou": 0.5}, pth)

    out = convert_main([
        "--torch-checkpoint", pth, "--out", os.path.join(tmp_path, "orbax"),
        "--structure", "1", "1", "1", "1",
        "--to-rename", "module.", "--rename", "",
    ])

    model_j = ResNeXtSeg(structure=(1, 1, 1, 1), input_channels=4,
                         dtype=jnp.float32)
    params, batch_stats = _jax_variables(
        model_j, [jnp.zeros((1, 32, 64, 3)), jnp.zeros((1, 32, 64, 1))])
    saved = load_checkpoint(out)["state_dict"]
    params = restore_partial(params, saved["params"], verbose=False)
    batch_stats = restore_partial(batch_stats, saved["batch_stats"],
                                  verbose=False)

    rng = np.random.RandomState(11)
    rgb = rng.randn(1, 32, 64, 3).astype(np.float32)
    ir = rng.randn(1, 32, 64, 1).astype(np.float32)
    seg_j, _, _ = model_j.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(rgb), jnp.asarray(ir), train=False)
    with torch.no_grad():
        seg_t, _, _ = model_t(_nchw(rgb), _nchw(ir))
    np.testing.assert_allclose(
        np.asarray(seg_j), seg_t.permute(0, 2, 3, 1).numpy(),
        rtol=2e-3, atol=2e-3)
