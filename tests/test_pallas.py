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
