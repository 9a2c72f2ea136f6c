"""Pallas kernel tests (interpret mode on CPU) vs the jnp reference ops."""

import numpy as np
import jax.numpy as jnp

from heatnet_tpu.ops import preprocess as P
from heatnet_tpu.ops.pallas_preproc import (
    inference_preprocess_fused,
    ir_normalize_fused,
    rgb_normalize_fused,
)

RNG = np.random.RandomState(0)


def test_ir_normalize_fused_matches_reference():
    ir = jnp.asarray(RNG.randint(20000, 28000, (2, 32, 96, 1)), jnp.uint16)
    fused = np.asarray(ir_normalize_fused(ir, out_dtype=jnp.float32,
                                          interpret=True))
    ref = np.asarray(P.normalize(P.ir_normalize(ir), (0.5,), (0.5,)))
    np.testing.assert_allclose(fused, ref, atol=1e-6)


def test_rgb_normalize_fused_matches_reference():
    rgb = jnp.asarray(RNG.randint(0, 255, (2, 32, 96, 3)), jnp.uint8)
    fused = np.asarray(rgb_normalize_fused(rgb, out_dtype=jnp.float32,
                                           interpret=True))
    ref = np.asarray(P.normalize(rgb.astype(jnp.float32) / 255.0))
    np.testing.assert_allclose(fused, ref, atol=1e-6)


def test_fused_handles_non_lane_multiple():
    # 5 * 7 * 3 = 105 elements, not a multiple of 128 → tail padding path
    x = jnp.asarray(RNG.randint(0, 255, (5, 7, 3)), jnp.uint8)
    fused = np.asarray(rgb_normalize_fused(x, out_dtype=jnp.float32,
                                           interpret=True))
    ref = np.asarray(P.normalize(x.astype(jnp.float32) / 255.0))
    np.testing.assert_allclose(fused, ref, atol=1e-6)


def test_inference_preprocess_fused_geometry():
    rgb = jnp.asarray(RNG.randint(0, 255, (1, 320, 960, 3)), jnp.uint8)
    ir = jnp.asarray(RNG.randint(21000, 26000, (1, 320, 960, 1)), jnp.uint16)
    rgb_o, ir_o = inference_preprocess_fused(rgb, ir, out_dtype=jnp.float32,
                                             interpret=True)
    assert rgb_o.shape == (1, 320, 704, 3)
    assert ir_o.shape == (1, 320, 704, 1)
    # matches the unfused chain on the same window
    ref_rgb = np.asarray(P.normalize(rgb.astype(jnp.float32) / 255.0))[:, :, 148:852]
    np.testing.assert_allclose(np.asarray(rgb_o), ref_rgb, atol=1e-6)


# ---------------------------------------------------------------------------
# Grouped 3x3 conv kernel (ops/pallas_grouped_conv.py)
# ---------------------------------------------------------------------------


def test_grouped_conv_blockdiag_matches_native():
    import jax
    from heatnet_tpu.ops.pallas_grouped_conv import grouped_conv3x3_blockdiag

    for (n, h, w, c, g, d) in [(2, 16, 22, 128, 64, 1),
                               (1, 10, 11, 256, 64, 1),
                               (2, 12, 14, 128, 64, 2)]:
        x = jnp.asarray(RNG.randn(n, h, w, c), jnp.float32)
        k = jnp.asarray(RNG.randn(3, 3, c // g, c) * 0.1, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
            feature_group_count=g,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = grouped_conv3x3_blockdiag(x, k, groups=g, dilation=d,
                                        dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-3)


def test_grouped_conv_custom_vjp_matches_dense_grads():
    """grouped_conv3x3's VJP must equal autodiff of the math it computes."""
    import jax
    from heatnet_tpu.ops import pallas_grouped_conv as pgc

    n, h, w, c, g = 1, 8, 10, 128, 64
    x = jnp.asarray(RNG.randn(n, h, w, c), jnp.float32)
    k = jnp.asarray(RNG.randn(3, 3, c // g, c) * 0.1, jnp.float32)

    def ref_loss(x, k):
        return jnp.sum(pgc._dense_reference(x, k, g, 1, jnp.float32) ** 2)

    gx_ref, gk_ref = jax.grad(ref_loss, argnums=(0, 1))(x, k)
    # drive _bwd with the same cotangent sum-of-squares produces
    cot = 2 * pgc._dense_reference(x, k, g, 1, jnp.float32)
    gx, gk = pgc._bwd(g, 1, jnp.float32, (x, k), cot)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               rtol=1e-4, atol=1e-4)


def test_grouped_conv_fused_epilogue_matches_composition():
    """act(conv*s+b) in-kernel == conv -> affine -> act composed in jnp."""
    from heatnet_tpu.ops.pallas_grouped_conv import (_dense_reference,
                                                     grouped_conv3x3_fused)

    n, h, w, c, g = 2, 12, 14, 128, 64
    x = jnp.asarray(RNG.randn(n, h, w, c), jnp.float32)
    k = jnp.asarray(RNG.randn(3, 3, c // g, c) * 0.1, jnp.float32)
    s = jnp.asarray(RNG.rand(c) + 0.5, jnp.float32)
    b = jnp.asarray(RNG.randn(c), jnp.float32)

    for act, slope in [("relu", 0.0), ("leaky_relu", 0.01), ("elu", 0.0),
                       ("none", 0.0)]:
        out = grouped_conv3x3_fused(x, k, s, b, groups=g, dilation=1,
                                    dtype=jnp.float32, act=act, slope=slope,
                                    interpret=True)
        y = _dense_reference(x, k, g, 1, jnp.float32) * s + b
        if act == "relu":
            y = jnp.maximum(y, 0)
        elif act == "leaky_relu":
            y = jnp.where(y > 0, y, slope * y)
        elif act == "elu":
            y = jnp.where(y > 0, y, jnp.expm1(y))
        np.testing.assert_allclose(np.asarray(out), np.asarray(y), atol=1e-3)


def test_residual_block_pallas_fused_matches_normal(monkeypatch):
    """IdentityResidualBlock under HEATNET_GC_IMPL=pallas_fused (interpret
    mode) must match the normal conv2 -> bn3 -> act composition."""
    import jax
    from heatnet_tpu.models.layers import IdentityResidualBlock, NormAct

    blk = IdentityResidualBlock(channels=(128, 128, 256), groups=64,
                                norm_act=NormAct(activation="leaky_relu"),
                                dtype=jnp.float32)
    x = jnp.asarray(RNG.randn(2, 10, 12, 128), jnp.float32)
    variables = blk.init({"params": jax.random.PRNGKey(0)}, x)
    # make BN affine + running stats non-trivial
    variables = jax.tree.map(
        lambda v: v + 0.1 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape)
        / v.size if v.ndim == 1 else v, variables)

    ref = blk.apply(variables, x)

    monkeypatch.setenv("HEATNET_GC_IMPL", "pallas_fused")
    monkeypatch.setenv("HEATNET_PALLAS_INTERPRET", "1")
    fused = blk.apply(variables, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # fallback (no interpret, no tpu): manual affine path, same numbers
    monkeypatch.delenv("HEATNET_PALLAS_INTERPRET")
    fallback = blk.apply(variables, x)
    np.testing.assert_allclose(np.asarray(fallback), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
