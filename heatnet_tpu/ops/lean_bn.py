"""Fused train-mode BatchNorm+activation with a hand-shaped minimal-pass VJP.

Motivation (VERDICT r3 "Next round" #3): the Vistas B=30 supervised step
runs at ~1.6x its own compiled HBM floor, and the named byte-side cause is
training-mode BN — under ``jax.grad`` of the flax BN + activation chain,
autodiff materializes intermediates (the relu cotangent mask application,
normalized activations) and the backward re-reads them, so every conv
output is traversed more times than the math requires.

This op pins the traffic to the minimum for *exact* BN semantics:

forward  (2 passes over the conv output ``y``):
  1. stat reduce: read ``y`` once, producing per-channel mean and
     E[y^2] in float32 (fast-variance form, same as flax
     ``_compute_stats(use_fast_variance=True)``),
  2. normalize+act: read ``y``, write ``a`` — XLA fuses this elementwise
     pass into the consumer where it can.

backward (2 passes; residuals are ``y`` + the tiny per-channel stats —
nothing elementwise is saved, matching the conv-save remat philosophy of
``models/layers.CONV_SAVE_POLICY``):
  1. reduce pass: read ``(y, dout)``, producing s1 = sum(dz * xhat) and
     s2 = sum(dz) where dz = dout * act'(pre) and xhat/pre recompute
     elementwise from ``y`` in-register,
  2. elementwise pass: read ``(y, dout)``, write
     dy = (gamma * rstd) * (dz - s2/N - xhat * s1/N)
     — the standard full BN backward *including* the gradient through the
     batch statistics (torch/flax semantics, not the frozen-stats form).

dgamma = s1, dbeta = s2 fall out of pass 1.

The activation derivative recomputes from ``y`` (relu/leaky: a sign test
on pre; elu: exp(pre)) so no mask or activation output is ever saved.

Numerics: reductions and the normalize math run in float32 regardless of
``y``'s dtype (flax ``force_float32_reductions`` semantics); ``a`` is cast
to ``y.dtype``; ``dy`` returns in ``y``'s dtype, dgamma/dbeta in float32.
Variance is the biased E[y^2]-E[y]^2 exactly like the flax path, so
running-stat updates built on the returned (mean, var) are bit-compatible
with ``StatNamedBatchNorm``'s.

Verified equivalent to the flax BN+act chain (forward, gradients, running
stats) in ``tests/test_lean_bn.py``. Reference semantics anchor: torch
``nn.BatchNorm2d`` in train mode as used by every ABN block
(/root/reference/models/segnet.py:20-41).

MEASURED OUTCOME (v5e, 2026-08-20, scan-differenced via
``tools/sweep_train_dispatch.py "lean=HEATNET_BN_IMPL:lean@..."``): a
WASH-to-slight-loss against the flax path under the shipped ``11cc``
remat default — Vistas B=30 632.2 ms vs 617.0, adv B=16 seg 465.0 vs
459.5 (critic 128.5 vs 130.5, within noise). Two reasons, confirmed by
the per-op trace of the baseline step:

1. XLA's autodiff + fusion already emits the BN backward at essentially
   this op shape — the hypothesized redundant materializations
   (cotangent mask, normalized activations) are fused away, so there was
   little to win;
2. ``jax.checkpoint`` does not look inside ``custom_vjp`` calls, so in
   '1'-remat stages the ``bn_stats`` checkpoint_names here are invisible
   to ``BN_STATS_SAVE_POLICY`` and the backward re-forward re-runs the
   stat reduces the flax path skips — the measured ~15 ms Vistas
   regression is mod2/mod3's re-run stat reduces.

The op stays opt-in (``HEATNET_BN_IMPL=lean``) as a negative-result
record; the flax path remains the default. The actual training-step
headroom is elsewhere: the B=30 trace attributes the gap above the
byte floor to backward-reduce/optimizer stalls and mod5 layout copies,
not to BN pass structure (see README "Training steps vs their compiled
floors").
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name


def _pre_act(y32, mean, rstd, scale, bias):
    """Elementwise pre-activation (xhat, pre) from y in float32."""
    xhat = (y32 - mean) * rstd
    return xhat, xhat * scale + bias


def _act(pre, act: str, slope: float):
    if act == "relu":
        return jnp.maximum(pre, 0.0)
    if act == "leaky_relu":
        return jnp.where(pre >= 0, pre, pre * slope)
    if act == "elu":
        return jnp.where(pre >= 0, pre, jnp.expm1(pre))
    if act == "none":
        return pre
    raise ValueError(f"unknown activation {act}")


def _dact(pre, act: str, slope: float):
    if act == "relu":
        return (pre > 0).astype(pre.dtype)
    if act == "leaky_relu":
        return jnp.where(pre > 0, 1.0, slope).astype(pre.dtype)
    if act == "elu":
        # d/dx elu = 1 (x>0) else exp(x); recomputed, never saved
        return jnp.where(pre > 0, 1.0, jnp.exp(pre)).astype(pre.dtype)
    if act == "none":
        return jnp.ones((), pre.dtype)
    raise ValueError(f"unknown activation {act}")


def _stats(y):
    """Per-channel (mean, var) in float32, fast-variance form.

    One read of ``y``: the two reduces (sum, sum of squares) share the
    operand and XLA's multi-output fusion emits them as a single pass.
    """
    y32 = y.astype(jnp.float32)
    axes = tuple(range(y.ndim - 1))
    mean = jnp.mean(y32, axis=axes)
    m2 = jnp.mean(jnp.square(y32), axis=axes)
    var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    return mean, var


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def lean_bn_act(y: jax.Array, scale: jax.Array, bias: jax.Array,
                eps: float, act: str, slope: float
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """act(batch-norm(y)) with train-mode batch statistics.

    Returns ``(a, mean, var)``; mean/var are float32 per-channel batch
    statistics for the caller's running-average update (no gradient flows
    through them — their cotangents are ignored, matching flax where the
    running stats live in a non-differentiated collection).
    """
    a, mean, var = _fwd_math(y, scale, bias, eps, act, slope)
    return a, mean, var


def _fwd_math(y, scale, bias, eps, act, slope):
    mean, var = _stats(y)
    mean = checkpoint_name(mean, "bn_stats")
    var = checkpoint_name(var, "bn_stats")
    rstd = jax.lax.rsqrt(var + eps)
    _, pre = _pre_act(y.astype(jnp.float32), mean, rstd,
                      scale.astype(jnp.float32), bias.astype(jnp.float32))
    return _act(pre, act, slope).astype(y.dtype), mean, var


def _lean_bwd(eps, act, slope, res, cts):
    y, mean, rstd, scale, bias = res
    dout = cts[0]
    y32 = y.astype(jnp.float32)
    d32 = dout.astype(jnp.float32)
    s32 = scale.astype(jnp.float32)
    b32 = bias.astype(jnp.float32)
    n = y.size // y.shape[-1]
    axes = tuple(range(y.ndim - 1))

    # pass 1 (reduce): dz = dout * act'(pre); s1 = sum(dz*xhat); s2 = sum(dz)
    xhat = (y32 - mean) * rstd
    pre = xhat * s32 + b32
    dz = d32 * _dact(pre, act, slope)
    s1 = jnp.sum(dz * xhat, axis=axes)     # = dgamma
    s2 = jnp.sum(dz, axis=axes)            # = dbeta

    # pass 2 (elementwise): full BN backward incl. gradient through stats
    dy = (s32 * rstd) * (dz - s2 / n - xhat * (s1 / n))
    return dy.astype(y.dtype), s1, s2


def _lean_fwd(y, scale, bias, eps, act, slope):
    a, mean, var = _fwd_math(y, scale, bias, eps, act, slope)
    rstd = jax.lax.rsqrt(var + eps)
    return (a, mean, var), (y, mean, rstd, scale, bias)


lean_bn_act.defvjp(_lean_fwd, _lean_bwd)
