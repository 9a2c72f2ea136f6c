"""Supervised segmentation training — the ``scripts/main.py`` train loop.

Reference: ``/root/reference/scripts/main.py:213-272`` — CrossEntropyLoss
with ``ignore_index=13`` (:223), poly LR (:232), grad clip (:256-257), Adam
(:159), validation with ``IoU(14, False, [12,13])`` (:275-318).

TPU-native shape: one jitted ``train_step`` over a ``Mesh`` — batch sharded
on the data axis, params replicated; XLA inserts the gradient all-reduce over
ICI (replaces ``nn.DataParallel``, scripts/main.py:120).

**BatchNorm semantics under GSPMD** (differs from the reference, by design):
inside sharded ``jit`` the BN mean/var reductions span the *global* batch —
XLA inserts the cross-device all-reduce because the reduced axis is sharded.
The reference's ``nn.DataParallel`` instead computes per-GPU statistics over
batch/num_gpus sub-batches. Global-batch BN gives lower-variance statistics
(strictly more stable at the reference's tiny per-GPU batch of 1); it is a
*train-time* difference only — eval uses running averages, and imported
reference checkpoints carry their own running stats, so eval-mIoU parity is
unaffected (verified by tests/test_torch_parity.py). Asserted in
tests/test_mesh.py::test_batchnorm_stats_are_global_batch.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .state import TrainState

IGNORE_INDEX = 13


def cross_entropy_ignore(logits: jax.Array, labels: jax.Array,
                         ignore_index: int = IGNORE_INDEX,
                         reduce: bool = True) -> jax.Array:
    """CE over NHWC logits / NHW int labels, masking ``ignore_index`` pixels.

    Matches ``nn.CrossEntropyLoss(ignore_index=13)`` (mean over non-ignored).
    """
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    if not reduce:
        return nll
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def robust_loss(loss: jax.Array, a: float = 0.5, c: float = 1.0) -> jax.Array:
    """Barron's general robust loss applied to a residual/loss tensor.

    Reference ``models/confusion_maximization/utils.py:13-26`` (instantiated
    at train_trgb_segnet_conf.py:369 but never consumed in a loss there —
    ported for surface completeness):
    ``(b/d) * ((((loss/c)^2)/b + 1)^(d/2) - 1)`` with ``b = |2-a|+eps`` and
    ``d = a±eps``.
    """
    e = 1e-05
    b = abs(2.0 - a) + e
    d = a + e if a >= 0.0 else a - e
    return (b / d) * (jnp.power(jnp.square(loss / c) / b + 1.0, 0.5 * d) - 1.0)


def make_train_step(model, learn_batch_stats: bool = True,
                    dropout_rng: Optional[jax.Array] = None):
    """Build the jitted supervised step: (state, batch) → (state, metrics).

    ``batch`` is a dict with ``image`` (NHWC, already normalized) and
    ``label`` (NHW int). Works single-chip and under a mesh unchanged — the
    sharding of the inputs decides the parallelism.

    ``dropout_rng``: pass a base key for models with train-time dropout
    (PSPNet's Dropout2d layers, pspnet.py:48,55 — the ``--arch pspnet``
    branch of scripts/main.py:114-115); each step folds in ``state.step``
    so masks differ per step but runs stay reproducible. The segnet zoo
    has no dropout and needs no key.
    """

    def loss_fn(params, batch_stats, batch, step):
        variables = {"params": params}
        mutable = False
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        rngs = (None if dropout_rng is None
                else {"dropout": jax.random.fold_in(dropout_rng, step)})
        out = model.apply(variables, batch["image"], None, train=True,
                          mutable=mutable, rngs=rngs)
        (seg, _taps, _cert), new_vars = out if mutable else (out, {})
        loss = cross_entropy_ignore(seg, batch["label"])
        return loss, (new_vars.get("batch_stats"), seg)

    # NOTE: no donate_argnums — callers (benches, tests) legitimately reuse
    # a state across calls, and the state copy this would save is ~0.4 ms
    # against a 47-174 ms step (device-to-device at HBM bandwidth).
    @jax.jit
    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Any]]:
        (loss, (new_bs, seg)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   state.step)
        new_state = state.apply_gradients(
            grads, new_bs if learn_batch_stats else None)
        preds = jnp.argmax(seg, axis=-1)
        valid = batch["label"] != IGNORE_INDEX
        acc = (jnp.where(valid, preds == batch["label"], False).sum()
               / jnp.maximum(valid.sum(), 1))
        return new_state, {"loss": loss, "accuracy": acc}

    return train_step


def make_eval_step(model, num_classes: int = 14):
    """Jitted eval step → per-batch confusion matrix (stays on device)."""
    from ..ops.iou import confusion_matrix

    @jax.jit
    def eval_step(state: TrainState, batch) -> jax.Array:
        seg, _, _ = model.apply(state.variables, batch["image"], None,
                                train=False)
        preds = jnp.argmax(seg, axis=-1)
        return confusion_matrix(preds, batch["label"], num_classes)

    return eval_step
