"""Parity tests for the lean fused BN+act (ops/lean_bn.py).

The lean path must be numerically interchangeable with the flax
StatNamedBatchNorm + activation chain it replaces under
``HEATNET_BN_IMPL=lean``: same forward, same gradients (including the
gradient through the batch statistics), same running-stat updates, same
variable tree. Verified at float32 against the default path, under plain
grad and under both stage-remat policies.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from heatnet_tpu.models.layers import (ABN, BN_STATS_SAVE_POLICY,
                                       CONV_SAVE_POLICY, NormAct)


def _run_chain(monkeypatch, impl, act="relu", dtype=jnp.float32,
               remat_policy=None):
    """value+grads+new batch_stats of sum(conv-free ABN chain) on fixed x."""
    if impl == "lean":
        monkeypatch.setenv("HEATNET_BN_IMPL", "lean")
    else:
        monkeypatch.delenv("HEATNET_BN_IMPL", raising=False)

    na = NormAct(activation=act)
    model = ABN(na, dtype)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4, 8, 8, 16) * 2.0 + 0.5, dtype)
    w = jnp.asarray(rs.randn(4, 8, 8, 16), dtype)

    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    # non-trivial affine so scale/bias gradients are exercised
    params = jax.tree_util.tree_map(
        lambda p: p + 0.3 * jnp.asarray(rs.randn(*p.shape), p.dtype),
        variables["params"])

    def loss_fn(params, x):
        def apply(x):
            out, new_vars = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return out, new_vars["batch_stats"]

        if remat_policy is not None:
            apply = jax.checkpoint(apply, policy=remat_policy)
        out, new_bs = apply(x)
        return jnp.sum(out * w), new_bs

    (val, new_bs), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, x)
    return val, grads, new_bs


@pytest.mark.parametrize("act", ["relu", "leaky_relu", "elu", "none"])
def test_lean_matches_flax_forward_and_grads(monkeypatch, act):
    v_f, g_f, bs_f = _run_chain(monkeypatch, "flax", act)
    v_l, g_l, bs_l = _run_chain(monkeypatch, "lean", act)

    np.testing.assert_allclose(float(v_l), float(v_f), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_l)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(bs_f),
                    jax.tree_util.tree_leaves(bs_l)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("policy", [BN_STATS_SAVE_POLICY, CONV_SAVE_POLICY])
def test_lean_under_remat_policies(monkeypatch, policy):
    """The custom_vjp must survive jax.checkpoint with the stage policies
    (the '1' and 'c' remat modes) with unchanged gradients."""
    v_f, g_f, _ = _run_chain(monkeypatch, "flax")
    v_l, g_l, _ = _run_chain(monkeypatch, "lean", remat_policy=policy)
    np.testing.assert_allclose(float(v_l), float(v_f), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_l)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_lean_variable_tree_identical(monkeypatch):
    """Same params/batch_stats names and shapes — checkpoints unaffected."""
    na = NormAct()
    x = jnp.zeros((2, 4, 4, 8))

    monkeypatch.delenv("HEATNET_BN_IMPL", raising=False)
    v_flax = ABN(na).init({"params": jax.random.PRNGKey(0)}, x, train=True)
    monkeypatch.setenv("HEATNET_BN_IMPL", "lean")
    v_lean = ABN(na).init({"params": jax.random.PRNGKey(0)}, x, train=True)

    flat_f = jax.tree_util.tree_flatten_with_path(v_flax)[0]
    flat_l = jax.tree_util.tree_flatten_with_path(v_lean)[0]
    assert [(p, v.shape, v.dtype) for p, v in flat_f] == \
           [(p, v.shape, v.dtype) for p, v in flat_l]


def test_lean_eval_mode_uses_flax_path(monkeypatch):
    """Eval (running stats) must be identical regardless of the knob."""
    na = NormAct()
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(2, 4, 4, 8), jnp.float32)

    monkeypatch.delenv("HEATNET_BN_IMPL", raising=False)
    model = ABN(na)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=True)
    out_f = model.apply(variables, x, train=False)
    monkeypatch.setenv("HEATNET_BN_IMPL", "lean")
    out_l = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_l))
