"""Int8 serving mode: Int8Conv / GroupedConvDense quant path / calibrate_int8.

The reference has no quantization story (fp32 torch serving,
scripts/inference.py:125-131); this is a TPU-era opt-in capability. The
contract under test:

1. bf16/f32-trained checkpoints serve unchanged — Int8Conv shares the f32
   ``kernel`` param layout with nn.Conv, GroupedConvDense keeps its grouped
   layout — so flipping HEATNET_QUANT=int8 needs no weight conversion.
2. Calibration (``calibrate_int8``) records static activation scales as a
   running max over batches into the ``quant`` collection.
3. Calibrated int8 outputs track the float path within per-tensor-symmetric
   quantization error.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heatnet_tpu.models.layers import conv, GroupedConvDense, Int8Conv
from heatnet_tpu.ops.quant import calibrate_int8

KEY = jax.random.PRNGKey(0)


@pytest.fixture
def int8_env(monkeypatch):
    monkeypatch.setenv("HEATNET_QUANT", "int8")
    # these tests exercise the quant math at tiny batches; disable the
    # throughput-regime batch gate (tested separately below)
    monkeypatch.setenv("HEATNET_INT8_MIN_BATCH", "1")


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


def test_conv_routes_to_int8(int8_env):
    m = conv(8, 3, dtype=jnp.bfloat16)
    assert isinstance(m, Int8Conv)


def test_conv_routes_float_without_env(monkeypatch):
    monkeypatch.delenv("HEATNET_QUANT", raising=False)
    m = conv(8, 3, dtype=jnp.bfloat16)
    assert not isinstance(m, Int8Conv)


def test_int8_conv_matches_float_after_calibration(int8_env, monkeypatch):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4), jnp.float32)

    # Init under int8 (same param tree as nn.Conv: f32 "kernel").
    q = conv(8, 3, use_bias=True, dtype=jnp.float32)
    variables = q.init({"params": KEY}, x)
    assert variables["params"]["kernel"].dtype == jnp.float32
    assert variables["quant"]["x_scale"].shape == ()

    variables = calibrate_int8(q.apply, variables, [(x,)])
    assert float(variables["quant"]["x_scale"]) > 0.0
    out_q = q.apply(variables, x)

    # Same params through the float path.
    monkeypatch.delenv("HEATNET_QUANT")
    f = conv(8, 3, use_bias=True, dtype=jnp.float32)
    out_f = f.apply({"params": variables["params"]}, x)

    assert out_q.shape == out_f.shape
    # per-tensor-symmetric int8: ~1% of dynamic range is the expected error
    assert _rel_err(out_q, out_f) < 0.05


def test_grouped_conv_int8_matches_float(int8_env, monkeypatch):
    """dense block-diag quantizes (~1% error); native serves bf16 exactly
    (int8 regresses native grouped convs on v5e — see GroupedConvDense).
    Both register the quant scale so calibration at one batch size serves
    at any other (dispatch is batch-dependent)."""
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 16), jnp.float32)
    for impl in ("dense", "native"):
        monkeypatch.setenv("HEATNET_GC_IMPL", impl)
        g = GroupedConvDense(features=16, kernel=3, groups=4, padding=1,
                             dtype=jnp.float32)
        variables = g.init({"params": KEY}, x)
        assert "quant" in variables, impl
        variables = calibrate_int8(g.apply, variables, [(x,)])
        assert float(variables["quant"]["x_scale"]) > 0.0, impl
        out_q = g.apply(variables, x)

        monkeypatch.delenv("HEATNET_QUANT")
        out_f = g.apply({"params": variables["params"]}, x)
        monkeypatch.setenv("HEATNET_QUANT", "int8")

        assert out_q.shape == out_f.shape
        if impl == "native":
            np.testing.assert_array_equal(np.asarray(out_q),
                                          np.asarray(out_f))
        else:
            assert 0 < _rel_err(out_q, out_f) < 0.05, impl


def test_calibration_running_max(int8_env):
    small = jnp.full((1, 8, 8, 4), 0.5, jnp.float32)
    big = jnp.full((1, 8, 8, 4), 4.0, jnp.float32)
    q = conv(8, 3, dtype=jnp.float32)
    variables = q.init({"params": KEY}, small)

    variables = calibrate_int8(q.apply, variables, [(small,), (big,), (small,)])
    # running max across batches: scale set by the largest activation
    np.testing.assert_allclose(
        float(variables["quant"]["x_scale"]), 4.0 / 127.0, rtol=1e-6)


def test_calibration_requires_batches():
    with pytest.raises(ValueError):
        calibrate_int8(lambda *a, **k: None, {"params": {}}, [])


def test_int8_model_end_to_end(int8_env, monkeypatch):
    """Flagship contract: ResNeXtSeg trained float, served int8.

    Params initialized WITHOUT the env flag (the bf16 training tree) must
    load into the int8 serving graph unchanged, and calibrated int8 argmax
    must agree with the float argmax on most pixels.
    """
    from heatnet_tpu.models import ResNeXtSeg

    rgb = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 64, 3))
    ir = jax.random.uniform(jax.random.PRNGKey(4), (1, 32, 64, 1))

    monkeypatch.delenv("HEATNET_QUANT")
    m = ResNeXtSeg(structure=(1, 1, 1, 1))
    float_vars = m.init({"params": KEY}, rgb, ir)
    seg_f, _, _ = m.apply(float_vars, rgb, ir)

    monkeypatch.setenv("HEATNET_QUANT", "int8")
    mq = ResNeXtSeg(structure=(1, 1, 1, 1))
    # adopt the float-trained tree; quant scales start empty
    qvars = mq.init({"params": jax.random.PRNGKey(9)}, rgb, ir)
    assert jax.tree.structure(qvars["params"]) == jax.tree.structure(
        float_vars["params"]), "int8 graph must share the float param tree"
    variables = {"params": float_vars["params"],
                 "batch_stats": float_vars["batch_stats"]}
    variables = calibrate_int8(mq.apply, variables, [(rgb, ir)])
    seg_q, _, _ = mq.apply(variables, rgb, ir)

    agree = float(jnp.mean(
        (jnp.argmax(seg_q, -1) == jnp.argmax(seg_f, -1)).astype(jnp.float32)))
    assert agree > 0.9, f"int8 argmax agreement {agree}"


def test_uncalibrated_int8_serves_float_path(int8_env):
    """ADVICE r1: serving with an uncalibrated quant collection (x_scale==0,
    e.g. variables straight from init) must NOT clamp the scale to 1e-12 and
    saturate — it falls back to the float conv, bit-for-bit."""
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 4), jnp.float32)
    q = conv(8, 3, dtype=jnp.float32)
    # the realistic uncalibrated state: init on zeros (what init_model
    # feeds) leaves x_scale == 0
    variables = q.init({"params": KEY}, jnp.zeros_like(x))
    assert float(variables["quant"]["x_scale"]) == 0.0
    out_q = q.apply(variables, x)

    # reuse the same kernel through the float path
    out_f = jax.lax.conv_general_dilated(
        x, variables["params"]["kernel"],
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_f),
                               rtol=1e-6, atol=1e-6)


def test_uncalibrated_grouped_int8_serves_float_path(int8_env):
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 16), jnp.float32)
    g = GroupedConvDense(features=16, kernel=3, groups=8, padding=1,
                         dtype=jnp.float32)
    variables = g.init({"params": KEY}, jnp.zeros_like(x))
    assert float(variables["quant"]["x_scale"]) == 0.0
    out_q = g.apply(variables, x)  # x_scale == 0 → float fallback
    assert np.isfinite(np.asarray(out_q)).all()
    # saturation symptom would be a near-constant extreme output
    assert float(np.abs(np.asarray(out_q)).max()) < 1e3


def test_int8_batch_gate(monkeypatch):
    """int8 is a throughput mode: below HEATNET_INT8_MIN_BATCH (default 8,
    the measured crossover — see layers._int8_batch_ok) a calibrated model
    serves the float conv bit-for-bit; at/above it, the quantized one.
    Calibration still records scales at ANY batch size (calibrate small,
    serve large)."""
    monkeypatch.setenv("HEATNET_QUANT", "int8")
    monkeypatch.delenv("HEATNET_INT8_MIN_BATCH", raising=False)
    x_small = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 4),
                                jnp.float32)
    x_big = jnp.tile(x_small, (4, 1, 1, 1))  # batch 8

    q = conv(8, 3, dtype=jnp.float32)
    variables = q.init({"params": KEY}, x_small)
    # calibration below the gate batch must still record the scale
    variables = calibrate_int8(q.apply, variables, [(x_small,)])
    assert float(variables["quant"]["x_scale"]) > 0.0

    out_small = q.apply(variables, x_small)

    monkeypatch.delenv("HEATNET_QUANT")
    f = conv(8, 3, dtype=jnp.float32)
    out_f = f.apply({"params": variables["params"]}, x_small)
    monkeypatch.setenv("HEATNET_QUANT", "int8")

    # batch 2 < 8: float path, bit-for-bit
    np.testing.assert_array_equal(np.asarray(out_small), np.asarray(out_f))

    # batch 8: the quantized path (differs from float by quant error)
    out_big = q.apply(variables, x_big)
    assert 0 < _rel_err(out_big[:2], out_f) < 0.05

    # override pulls the gate down
    monkeypatch.setenv("HEATNET_INT8_MIN_BATCH", "2")
    out_small_q = q.apply(variables, x_small)
    np.testing.assert_array_equal(np.asarray(out_small_q),
                                  np.asarray(out_big[:2]))


def test_int8_small_batch_serves_bf16_subpixel_path(monkeypatch):
    """Full-model gate composition (VERDICT r4 Weak #4): at batch < 8 a
    calibrated ``--quant int8`` model must serve the bf16 graph EXACTLY —
    the int8 batch gate (layers._int8_batch_ok, default min batch 8) and
    the subpixel-deconv dispatch (layers.SubpixelConvTranspose, serving
    subpixel below HEATNET_SUBPIXEL_MAX_BATCH=8) both fall to the same
    branch, so `int8 @ batch 4` == `bf16 @ batch 4` bit-for-bit."""
    from heatnet_tpu.models import ResNeXtSeg

    monkeypatch.delenv("HEATNET_INT8_MIN_BATCH", raising=False)
    monkeypatch.delenv("HEATNET_SUBPIXEL_MAX_BATCH", raising=False)
    monkeypatch.delenv("HEATNET_QUANT", raising=False)

    rgb = jax.random.normal(jax.random.PRNGKey(1), (4, 64, 64, 3), jnp.float32)
    ir = jax.random.normal(jax.random.PRNGKey(2), (4, 64, 64, 1), jnp.float32)

    model = ResNeXtSeg(structure=(1, 1, 1, 1), input_channels=4,
                       dtype=jnp.bfloat16)
    variables = model.init({"params": KEY}, rgb, ir)
    seg_bf16, _, _ = model.apply(variables, rgb, ir)

    monkeypatch.setenv("HEATNET_QUANT", "int8")
    qmodel = ResNeXtSeg(structure=(1, 1, 1, 1), input_channels=4,
                        dtype=jnp.bfloat16)
    qvars = calibrate_int8(qmodel.apply, dict(variables), [(rgb, ir)])
    seg_int8, _, _ = qmodel.apply(qvars, rgb, ir)

    np.testing.assert_array_equal(np.asarray(seg_int8, np.float32),
                                  np.asarray(seg_bf16, np.float32))
