"""SubpixelConvTranspose must be element-exact vs nn.ConvTranspose.

The subpixel form is a pure re-slicing of the same (k, k, cin, cout)
parameter into a SAME 3x3 conv + depth-to-space (layers.py docstring has
the derivation); outputs must match the flax transposed conv to float
tolerance for both geometries the model zoo uses, on odd and even sizes,
and the parameter tree must be identical so checkpoints/torch imports
are unaffected.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heatnet_tpu.models.layers import SubpixelConvTranspose, deconv


@pytest.mark.parametrize("k,s,p", [(8, 4, 2), (4, 2, 1)])
@pytest.mark.parametrize("hw,batch", [((7, 9), 2), ((8, 8), 2),
                                      ((5, 16), 2), ((6, 6), 8)])
def test_subpixel_matches_convtranspose(monkeypatch, k, s, p, hw, batch):
    """batch=8 exercises the large-batch lhs-dilated fallback branch."""
    from flax import linen as nn

    h, w = hw
    cin, cout = 13, 13
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(batch, h, w, cin), jnp.float32)

    monkeypatch.setenv("HEATNET_SUBPIXEL_DECONV", "0")
    ref = deconv(cout, k, s, p, name="up")
    assert isinstance(ref, nn.ConvTranspose)
    v = ref.init({"params": jax.random.PRNGKey(0)}, x)
    out_ref = ref.apply(v, x)

    monkeypatch.setenv("HEATNET_SUBPIXEL_DECONV", "1")
    sub = deconv(cout, k, s, p, name="up")
    assert isinstance(sub, SubpixelConvTranspose)
    v2 = sub.init({"params": jax.random.PRNGKey(0)}, x)
    # identical parameter tree (names, shapes)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(v2)):
        assert a.shape == b.shape
    out_sub = sub.apply(v, x)  # SAME params as the reference run

    assert out_sub.shape == out_ref.shape == (batch, h * s, w * s, cout)
    np.testing.assert_allclose(np.asarray(out_sub), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_subpixel_gradients_match(monkeypatch):
    h, w, cin, cout, k, s, p = 6, 7, 5, 4, 8, 4, 2
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, h, w, cin), jnp.float32)
    g = jnp.asarray(rs.randn(1, h * s, w * s, cout), jnp.float32)

    monkeypatch.setenv("HEATNET_SUBPIXEL_DECONV", "0")
    ref = deconv(cout, k, s, p, name="up")
    v = ref.init({"params": jax.random.PRNGKey(0)}, x)

    monkeypatch.setenv("HEATNET_SUBPIXEL_DECONV", "1")
    sub = deconv(cout, k, s, p, name="up")

    def loss(mod, params, x):
        return jnp.sum(mod.apply(params, x) * g)

    l_r, gr = jax.value_and_grad(lambda p_, x_: loss(ref, p_, x_),
                                 argnums=(0, 1))(v, x)
    l_s, gs = jax.value_and_grad(lambda p_, x_: loss(sub, p_, x_),
                                 argnums=(0, 1))(v, x)
    np.testing.assert_allclose(float(l_s), float(l_r), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gr), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)
