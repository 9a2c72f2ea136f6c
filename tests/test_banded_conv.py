"""banded_dilated_conv: OOB-tap elimination must be exactly the padded conv.

Covers the geometries the cost model splits at the flagship grid (rates
24/36 on 40 rows), the degenerate r >= S case (side taps never valid),
forced full recursion (both axes), and the auto fallback (rate 12 stays
monolithic). Reference semantics: zero-padded dilated cross-correlation,
padding == dilation (trgb_segnet.py:143-150 ASPP branches).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heatnet_tpu.models.layers import DilatedConvBanded, banded_dilated_conv


def _ref(x, kern, r):
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), ((r, r), (r, r)), rhs_dilation=(r, r),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("h,w,r", [
    (40, 88, 36),   # flagship rate 36: H splits (ratio 9.6), W does not
    (40, 88, 24),   # flagship rate 24: H splits (ratio 1.6)
    (40, 88, 12),   # rate 12: cost model keeps the monolithic conv
    (10, 88, 36),   # r >= H: side row taps never valid
    (10, 12, 36),   # r >= both: reduces to the center tap only
    (40, 40, 36),   # square grid: both axes eligible
])
def test_banded_equals_monolithic_auto(h, w, r):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w, 16), jnp.float32)
    kern = jnp.asarray(rng.randn(3, 3, 16, 8), jnp.float32)
    got = banded_dilated_conv(x, kern, r, jnp.float32, mode="auto")
    want = _ref(x, kern, r)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_banded_force_full_recursion():
    # force splits every 3-tap axis regardless of profitability: the
    # recursion (center + two shifted bands, both axes) must still be
    # the same conv
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 31, 23, 5), jnp.float32)
    kern = jnp.asarray(rng.randn(3, 3, 5, 7), jnp.float32)
    for r in (1, 2, 9, 22, 30, 40):
        got = banded_dilated_conv(x, kern, r, jnp.float32, mode="force")
        np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, kern, r)),
                                   rtol=1e-5, atol=1e-5, err_msg=f"r={r}")


def test_banded_module_param_layout_matches_nn_conv():
    # drop-in contract: same param name/shape as the nn.Conv it replaces,
    # so torch import / checkpoints / TP sharding see no difference
    mod = DilatedConvBanded(features=8, dilation=36)
    x = jnp.zeros((1, 40, 88, 16))
    variables = mod.init(jax.random.PRNGKey(0), x)
    assert variables["params"]["kernel"].shape == (3, 3, 16, 8)
    out = mod.apply(variables, x)
    assert out.shape == (1, 40, 88, 8)


def test_banded_bf16_close_to_monolithic():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 40, 88, 32), jnp.bfloat16)
    kern = jnp.asarray(rng.randn(3, 3, 32, 8), jnp.float32)
    got = banded_dilated_conv(x, kern, 36, jnp.bfloat16, mode="auto")
    want = banded_dilated_conv(x, kern, 36, jnp.bfloat16, mode="off")
    assert got.dtype == jnp.bfloat16
    # both are bf16 convs of the same values; only the summation grouping
    # differs, so they agree to bf16 rounding of the partial sums
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.1, atol=0.1)


def test_banded_int8_bit_identical():
    # int32 accumulation is exact: the int8 serving path is the SAME
    # integers banded or not (Int8Conv relies on this)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randint(-127, 128, (2, 40, 88, 16)), jnp.int8)
    k = jnp.asarray(rng.randint(-127, 128, (3, 3, 16, 8)), jnp.int8)
    for r in (24, 36):
        got = banded_dilated_conv(x, k, r, jnp.bfloat16, mode="force")
        want = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((r, r), (r, r)), rhs_dilation=(r, r),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        assert got.dtype == jnp.int32
        assert np.array_equal(np.asarray(got), np.asarray(want))


def test_banded_is_differentiable():
    # training uses the same forward (ASPP in every trainer): grads of the
    # decomposed form must match the monolithic conv's
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 12, 10, 4), jnp.float32)
    kern = jnp.asarray(rng.randn(3, 3, 4, 6), jnp.float32)

    g1 = jax.grad(lambda k: banded_dilated_conv(x, k, 9, jnp.float32,
                                                mode="force").sum())(kern)
    g2 = jax.grad(lambda k: _ref(x, k, 9).sum())(kern)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


def test_banded_is_differentiable_bf16():
    # bf16 training regression: the partial convs must keep operands and
    # output in one dtype or the conv transpose rule fails with a mixed-
    # dtype error (caught live by tools/bench_train_step.py)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 40, 88, 8), jnp.bfloat16)
    kern = jnp.asarray(rng.randn(3, 3, 8, 4), jnp.float32)

    def loss(k):
        out = banded_dilated_conv(x, k.astype(jnp.bfloat16), 36,
                                  jnp.bfloat16, mode="auto")
        return out.astype(jnp.float32).sum()

    g1 = jax.grad(loss)(kern)
    g2 = jax.grad(lambda k: _ref(x.astype(jnp.float32), k, 36).sum())(kern)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=0.05, atol=0.3)
