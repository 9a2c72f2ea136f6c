"""Checkpoint IO tests: save/restore, partial/renamed semantics, torch import.

The torch-import tests build real torch layers and assert numerical
equivalence of the converted flax computation — the strongest possible check
that reference checkpoints carry over exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from heatnet_tpu.io.checkpoint import (
    best_iou_tracker,
    load_checkpoint,
    restore_full,
    restore_partial,
    restore_renamed,
    save_checkpoint,
)


def _tree():
    return {
        "a": {"kernel": np.ones((2, 2), np.float32)},
        "b": {"bias": np.zeros((3,), np.float32)},
    }


def test_save_load_roundtrip(tmp_path):
    bundle = {"epoch": 3, "state_dict": _tree(), "best_iou": 0.5}
    p = save_checkpoint(bundle, str(tmp_path / "ckpt"))
    restored = load_checkpoint(p)
    assert restored["epoch"] == 3
    np.testing.assert_array_equal(restored["state_dict"]["a"]["kernel"],
                                  bundle["state_dict"]["a"]["kernel"])


def test_save_best_copy(tmp_path):
    p = save_checkpoint({"x": np.ones(2)}, str(tmp_path / "c"), is_best=True)
    best = load_checkpoint(p + "_best")
    np.testing.assert_array_equal(best["x"], np.ones(2))


def test_restore_partial_intersection():
    target = _tree()
    saved = {"a": {"kernel": np.full((2, 2), 7.0, np.float32)},
             "c": {"junk": np.ones(1)}}
    out = restore_partial(target, saved, verbose=False)
    assert out["a"]["kernel"][0, 0] == 7.0
    np.testing.assert_array_equal(out["b"]["bias"], target["b"]["bias"])


def test_restore_partial_shape_mismatch_skipped():
    target = _tree()
    saved = {"a": {"kernel": np.ones((5, 5), np.float32)}}
    out = restore_partial(target, saved, verbose=False)
    assert out["a"]["kernel"].shape == (2, 2)


def test_restore_renamed_prefix():
    target = {"trgb_segnet": _tree()}
    saved = {"module": {"a": {"kernel": np.full((2, 2), 3.0, np.float32)}}}
    out = restore_renamed(target, saved, "module/", "trgb_segnet/",
                          verbose=False)
    assert out["trgb_segnet"]["a"]["kernel"][0, 0] == 3.0


def test_restore_renamed_asserts_on_zero_hits():
    with pytest.raises(AssertionError):
        restore_renamed({"x": {"y": np.ones(1)}}, {"z": {"w": np.ones(1)}},
                        "nope", "nada", verbose=False)


def test_restore_full_raises_on_missing():
    with pytest.raises(KeyError):
        restore_full(_tree(), {"a": {"kernel": np.ones((2, 2))}})


def test_best_iou_tracker():
    track = best_iou_tracker()
    assert track(0.5) and not track(0.4) and track(0.6)


# ---------------------------------------------------------------------------
# torch import equivalence
# ---------------------------------------------------------------------------


def test_torch_conv_conversion_numerics():
    torch = pytest.importorskip("torch")
    from flax import linen as nn
    from heatnet_tpu.io.torch_import import convert_state_dict

    tconv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=True)
    x = np.random.RandomState(0).rand(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)

    params_flat, _ = convert_state_dict(tconv.state_dict())
    fconv = nn.Conv(8, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    variables = {"params": {"kernel": jnp.asarray(params_flat["kernel"]),
                            "bias": jnp.asarray(params_flat["bias"])}}
    ours = np.asarray(fconv.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_torch_grouped_conv_conversion():
    torch = pytest.importorskip("torch")
    from flax import linen as nn
    from heatnet_tpu.io.torch_import import convert_state_dict

    tconv = torch.nn.Conv2d(8, 8, 3, padding=1, groups=4, bias=False)
    x = np.random.RandomState(0).rand(1, 8, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    params_flat, _ = convert_state_dict(tconv.state_dict())
    fconv = nn.Conv(8, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=4,
                    use_bias=False)
    ours = np.asarray(fconv.apply(
        {"params": {"kernel": jnp.asarray(params_flat["kernel"])}},
        jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_torch_deconv_conversion_numerics():
    torch = pytest.importorskip("torch")
    from heatnet_tpu.models.layers import deconv
    from heatnet_tpu.io.torch_import import convert_state_dict

    tdeconv = torch.nn.ConvTranspose2d(4, 6, 4, stride=2, padding=1, bias=False)
    x = np.random.RandomState(1).rand(1, 4, 8, 8).astype(np.float32)
    with torch.no_grad():
        ref = tdeconv(torch.from_numpy(x)).numpy().transpose(0, 2, 3, 1)
    # name it 'up' so the converter applies deconv layout rules
    params_flat, _ = convert_state_dict({"up.weight": tdeconv.weight})
    fdeconv = deconv(6, 4, 2, 1)
    ours = np.asarray(fdeconv.apply(
        {"params": {"kernel": jnp.asarray(params_flat["up/kernel"])}},
        jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_torch_bn_and_linear_conversion():
    torch = pytest.importorskip("torch")
    from heatnet_tpu.io.torch_import import convert_state_dict

    bn = torch.nn.BatchNorm2d(5)
    bn.weight.data.fill_(2.0)
    bn.running_mean.fill_(0.5)
    params_flat, stats_flat = convert_state_dict(
        {"bn1.bn." + k: v for k, v in bn.state_dict().items()})
    assert params_flat["bn1/bn/scale"][0] == 2.0
    assert stats_flat["bn1/bn/mean"][0] == 0.5

    lin = torch.nn.Linear(3, 7)
    p, _ = convert_state_dict({"fc." + k: v for k, v in lin.state_dict().items()})
    assert p["fc/kernel"].shape == (3, 7)


def test_torch_resnext_block_path_renames():
    torch = pytest.importorskip("torch")
    from heatnet_tpu.io.torch_import import convert_state_dict

    sd = {
        "mod2_1.block1.convs.conv1.weight": torch.zeros(4, 4, 1, 1),
        "mod1.conv1_2.weight": torch.zeros(8, 4, 3, 3),
        "mod1.bn1_2.bn.weight": torch.zeros(8),
    }
    p, _ = convert_state_dict(sd)
    assert "mod2_1/block1/conv1/kernel" in p
    assert "mod1/conv1/kernel" in p
    assert "mod1/bn1/bn/scale" in p


def test_resolve_auto_resume(tmp_path):
    import os

    from heatnet_tpu.io.checkpoint import resolve_auto_resume

    ck = os.path.join(tmp_path, "ck")
    # auto + nothing saved yet -> fresh start
    assert resolve_auto_resume("auto", ck) == ""
    os.makedirs(ck)
    # auto + checkpoint present -> that path
    assert resolve_auto_resume("auto", ck) == os.path.abspath(ck)
    # explicit paths and empty pass through untouched
    assert resolve_auto_resume("", ck) == ""
    assert resolve_auto_resume("/x/y", ck) == "/x/y"


def test_restore_partial_require_match_raises():
    """ADVICE r1: a zero-intersection restore must fail loudly when the
    caller opts in (export CLI), instead of shipping random weights."""
    import pytest

    from heatnet_tpu.io.checkpoint import restore_partial

    target = {"a": {"kernel": np.zeros((3, 3))}}
    saved = {"completely": {"different": np.ones((2,))}}
    with pytest.raises(KeyError):
        restore_partial(target, saved, verbose=False, require_match=True)
    # default stays lenient
    out = restore_partial(target, saved, verbose=False)
    assert out["a"]["kernel"].shape == (3, 3)


def test_export_cli_arch_flag_is_honored():
    """ADVICE r1: --arch must change the exported model family."""
    from heatnet_tpu.cli.export_model import build_parser

    args = build_parser().parse_args(
        ["--arch", "pspnet", "--backend", "resnet18", "--out", "/tmp/x"])
    assert args.arch == "pspnet" and args.backend == "resnet18"
    import pytest
    with pytest.raises(SystemExit):
        build_parser().parse_args(["--arch", "nonsense", "--out", "/tmp/x"])
