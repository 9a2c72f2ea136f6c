"""Shape/dtype tests for the model zoo.

Expected shapes derive from the reference architectures (SURVEY.md §2.2):
- trgb_segnet tap channels [13,512,1024,512,256,64] / late [13,768,1024,512,512,128]
- PSPNet taps [13,2048,1024,512,256,64] (conf_segnet.py:44-49)
- MFNet unit_test: (2,4,480,640) → (2,9,480,640) (MFNet.py:109-120) — run at
  reduced size here (same 16x divisibility).
Small structures keep CPU runtime bounded; channel arithmetic is structure-
independent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heatnet_tpu.models import (
    ConfSegnet, Discriminator, Generator, MFNet, PSPNet, RTFNet,
    ResNeXtDecoder, ResNeXtEncoder, ResNeXtSeg, UNetAdapter, UNetSeg,
    tap_channels, get_model,
)

KEY = jax.random.PRNGKey(0)
TINY = (1, 1, 1, 1)


def init_and_apply(model, *args, **kwargs):
    variables = model.init({"params": KEY}, *args, **kwargs)
    return model.apply(variables, *args, **kwargs), variables


def test_resnext_seg_early_fusion_shapes():
    m = ResNeXtSeg(structure=TINY, cert_branch=True)
    rgb, ir = jnp.zeros((2, 64, 128, 3)), jnp.zeros((2, 64, 128, 1))
    (seg, taps, cert), _ = init_and_apply(m, rgb, ir)
    assert seg.shape == (2, 64, 128, 13) and seg.dtype == jnp.float32
    assert cert.shape == (2, 64, 128, 1)
    assert [t.shape[-1] for t in taps] == tap_channels()
    # tap resolutions: full, 1/8, 1/8, 1/8, 1/4, 1/4
    assert [t.shape[1] for t in taps] == [64, 8, 8, 8, 16, 16]


def test_resnext_seg_late_fusion_channels():
    m = ResNeXtSeg(structure=TINY, late_fusion=True)
    rgb, ir = jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1))
    (seg, taps, cert), _ = init_and_apply(m, rgb, ir)
    assert [t.shape[-1] for t in taps] == tap_channels(late_fusion=True)
    assert cert is None


def test_resnext_seg_single_modality():
    m = ResNeXtSeg(structure=TINY, input_channels=1)
    ir = jnp.zeros((1, 64, 64, 1))
    (seg, _, _), _ = init_and_apply(m, ir, None)
    assert seg.shape == (1, 64, 64, 13)


def test_resnext_vistas_7x7_stem():
    # Vistas variant stem (segnet.py:272-276): 2x downsample stem
    m = ResNeXtSeg(structure=TINY, input_channels=3, input_3x3=False)
    (seg, taps, _), _ = init_and_apply(m, jnp.zeros((1, 64, 64, 3)), None)
    assert seg.shape[1:3] == (128, 128)  # decoder upsamples 4x from 1/2-res taps


def test_pspnet_shapes():
    m = PSPNet(backend="resnet18", psp_size=512, in_channels=4)
    rgb, ir = jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1))
    (out, taps, cert), _ = init_and_apply(m, rgb, ir)
    assert out.shape == (1, 64, 64, 13)
    assert cert is None
    assert len(taps) == 6 and taps[0] is out
    assert [t.shape[-1] for t in taps] == [13, 512, 256, 128, 64, 64]


def test_pspnet_late_fusion():
    m = PSPNet(backend="resnet18", psp_size=512, late_fusion=True)
    rgb, ir = jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1))
    (out, taps, _), _ = init_and_apply(m, rgb, ir)
    assert out.shape == (1, 64, 64, 13)
    assert [t.shape[-1] for t in taps] == [13, 512, 256, 256, 128, 128]


def test_fcdiscriminator_patch_map():
    from heatnet_tpu.models.critics import FCDiscriminator
    m = FCDiscriminator()
    x = jnp.zeros((2, 64, 128, 13))
    y, _ = init_and_apply(m, x)
    assert y.shape == (2, 64, 128, 1)  # upsampled back to input resolution


def test_resnet_critic_scalar_output():
    from heatnet_tpu.models.critics import create_critic
    m = create_critic("resnet18")
    y, _ = init_and_apply(m, jnp.zeros((2, 64, 64, 512)), None)
    assert y.shape == (2, 1)


def test_downnet_halves_resolution():
    from heatnet_tpu.models.critics import DownNet
    m = DownNet(3)
    y, _ = init_and_apply(m, jnp.zeros((1, 64, 64, 13)))
    assert y.shape == (1, 8, 8, 13)


def test_unet_adapter_identity_shape():
    m = UNetAdapter(4)
    y, _ = init_and_apply(m, jnp.zeros((1, 64, 64, 4)))
    assert y.shape == (1, 64, 64, 4)


def test_unet_seg_sigmoid_range():
    m = UNetSeg(2)
    y, _ = init_and_apply(m, jnp.ones((1, 32, 32, 3)))
    assert y.shape == (1, 32, 32, 2)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_cyclegan_generator_shapes_and_range():
    m = Generator(output_nc=1, n_residual_blocks=2)
    y, _ = init_and_apply(m, jnp.zeros((1, 64, 64, 1)))
    assert y.shape == (1, 64, 64, 1)
    assert float(y.min()) >= -1.0 and float(y.max()) <= 1.0


def test_cyclegan_discriminator():
    m = Discriminator()
    y, _ = init_and_apply(m, jnp.zeros((2, 64, 64, 1)), None)
    assert y.shape == (2, 1)


def test_mfnet_unit_test_shape():
    # reference unit_test at 480x640; reduced to 96x160 (same 16x structure)
    m = MFNet(n_class=9)
    y, _ = init_and_apply(m, jnp.zeros((2, 96, 160, 4)))
    assert y.shape == (2, 96, 160, 9)


def test_rtfnet_unit_test_shape():
    m = RTFNet(n_class=9, layers=(1, 1, 1, 1))
    y, _ = init_and_apply(m, jnp.zeros((1, 96, 160, 4)))
    assert y.shape == (1, 96, 160, 9)


def test_segnetsplit_encoder_decoder():
    enc = ResNeXtEncoder(structure=TINY, classes=12, in_channels=1)
    x = jnp.zeros((1, 64, 64, 1))
    (seg, out_4), _ = init_and_apply(enc, x)
    assert seg.shape == (1, 16, 16, 12)  # 7x7 stem → 1/2, stage3 → 1/4
    assert out_4.shape == (1, 32, 32, 256)
    dec = ResNeXtDecoder(out_classes=12, last_activation="sigmoid")
    y, _ = init_and_apply(dec, seg, out_4)
    assert y.shape == (1, 64, 64, 12)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_conf_segnet_output_dict():
    # resnet critics tolerate small taps; FCDiscriminator needs >=32px taps
    # (fine at the reference 320x640 crop, see test below)
    m = ConfSegnet(disc_arch="resnet18", num_critics=3, structure=TINY)
    rgb, ir = jnp.zeros((2, 64, 64, 3)), jnp.zeros((2, 64, 64, 1))
    out, _ = init_and_apply(m, [rgb, ir], [rgb, ir])
    assert out["pred_label_a"].shape == (2, 64, 64, 13)
    assert len(out["critics_a"]) == 3 and len(out["critics_b"]) == 3
    assert out["critics_a"][0].shape == (2, 1)
    assert m.critic_taps() == [13, 512, 1024]


def test_conf_segnet_fcdisc_at_reference_scale():
    m = ConfSegnet(disc_arch="cyclegan", num_critics=2, structure=TINY)
    rgb, ir = jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 256, 256, 1))
    out, _ = init_and_apply(m, [rgb, ir], [rgb, ir])
    assert out["critics_a"][0].shape == (1, 256, 256, 1)  # patch map at input res
    assert out["critics_a"][1].shape[-1] == 1


def test_conf_segnet_feedback_and_adapter():
    m = ConfSegnet(disc_arch="resnet18", num_critics=2, structure=TINY,
                   feedback_seg=True, input_adapter=True)
    rgb, ir = jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1))
    out, _ = init_and_apply(m, [rgb, ir], [rgb, ir])
    # adapter critic appended after the tap critics
    assert len(out["critics_a"]) == 3
    assert out["input_a"].shape == (1, 64, 64, 4)


def test_registry():
    m = get_model("net_resnext50")
    assert isinstance(m, ResNeXtSeg) and m.structure == (3, 4, 6, 3)
    with pytest.raises(KeyError):
        get_model("nope")


def test_pspnet_densenet_backend():
    m = PSPNet(backend="densenet", psp_size=1024)
    (out, taps, _), _ = init_and_apply(m, jnp.zeros((1, 64, 64, 3)), None)
    assert out.shape == (1, 64, 64, 13)
    assert [t.shape[-1] for t in taps] == [13, 1024, 512, 256, 256, 64]


def test_pspnet_squeezenet_backend():
    m = PSPNet(backend="squeezenet", psp_size=512)
    (out, taps, _), _ = init_and_apply(m, jnp.zeros((1, 64, 64, 3)), None)
    assert out.shape == (1, 64, 64, 13)
    assert [t.shape[-1] for t in taps] == [13, 512, 256, 128, 64, 64]


def test_build_network_all_seven_backends():
    """build_net.py:7-16 backend/psp_size parity."""
    from heatnet_tpu.models.registry import _PSP_BACKENDS, build_network

    assert set(_PSP_BACKENDS) == {
        "squeezenet", "densenet", "resnet18", "resnet34", "resnet50",
        "resnet101", "resnet152"}
    for backend in ("squeezenet", "densenet", "resnet34"):
        m = build_network(backend)
        assert isinstance(m, PSPNet) and m.backend == backend
    assert build_network("DENSENET").psp_size == 1024  # .lower() parity
    with pytest.raises(KeyError):
        build_network("vgg16")
    with pytest.raises(ValueError):
        init_and_apply(build_network("densenet", late_fusion=True),
                       jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1)))


def test_bf16_compute_f32_logits():
    m = ResNeXtSeg(structure=TINY, dtype=jnp.bfloat16)
    rgb, ir = jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 1))
    variables = m.init({"params": KEY}, rgb, ir)
    # params stay f32, logits come back f32
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32
    seg, taps, _ = m.apply(variables, rgb, ir)
    assert seg.dtype == jnp.float32
    assert taps[2].dtype == jnp.bfloat16  # intermediate compute in bf16


def test_batchnorm_train_updates_stats():
    m = ResNeXtSeg(structure=TINY)
    rgb = jax.random.normal(KEY, (2, 64, 64, 3))
    ir = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 1))
    variables = m.init({"params": KEY}, rgb, ir)
    _, mutated = m.apply(variables, rgb, ir, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["mod1"]["bn1"]["bn"]["mean"]
    after = mutated["batch_stats"]["mod1"]["bn1"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_grouped_conv_dense_equals_native():
    """GroupedConvDense (block-diagonal dense compute) must match XLA's
    native grouped conv bit-for-bit with the same (grouped) kernel layout."""
    import os
    from heatnet_tpu.models.layers import conv

    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 32), jnp.float32)
    dense_mod = conv(64, 3, groups=8, dilation=2)
    v = dense_mod.init({"params": KEY}, x)
    assert v["params"]["kernel"].shape == (3, 3, 4, 64)  # grouped layout
    out_dense = dense_mod.apply(v, x)

    os.environ["HEATNET_NATIVE_GROUPS"] = "1"
    try:
        native_mod = conv(64, 3, groups=8, dilation=2)
        out_native = native_mod.apply(v, x)
    finally:
        del os.environ["HEATNET_NATIVE_GROUPS"]
    np.testing.assert_array_equal(np.asarray(out_dense), np.asarray(out_native))


def test_scan_benchmark_scales_with_work():
    from heatnet_tpu.utils.profiling import scan_benchmark

    a = jnp.ones((256, 256), jnp.float32)
    t_small = scan_benchmark(lambda x: x @ x, (a,), n_small=2, n_large=10, reps=2)
    assert t_small > 0
