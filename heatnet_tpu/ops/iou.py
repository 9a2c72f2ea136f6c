"""On-device confusion matrix / IoU ops.

The reference accumulates its confusion matrix on host with a bincount trick
(``scripts/iou_eval.py:81-88``) and computes HeatNet per-class IoUs with
boolean-mask loops (``models/confusion_maximization/utils.py:134-163``). On
TPU we keep the whole reduction on device: the confusion matrix is a one-hot
matmul (rides the MXU, batch-friendly) and per-class IoU falls out of it with
three reductions — no host transfer until the final (K, K) matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confusion_matrix(predicted: jax.Array, target: jax.Array, num_classes: int) -> jax.Array:
    """(K, K) confusion matrix, rows = target, cols = predicted.

    Matches ``ConfusionMatrix.add`` (scripts/iou_eval.py:81-88); out-of-range
    labels (e.g. padded pixels encoded as >= num_classes) contribute nothing.
    """
    predicted = predicted.reshape(-1)
    target = target.reshape(-1)

    # f32 matmul accumulation is exact only below 2^24 counts per cell; a
    # large batch (e.g. 128 x 320x704 = 28.8M pixels) could silently
    # saturate a dominant cell. Chunk the pixel stream and accumulate the
    # per-chunk matrices in int32 (out-of-range pad index n contributes
    # all-zero one-hot rows).
    chunk = 1 << 22
    if predicted.size <= chunk:
        return _confusion_chunk(predicted, target, num_classes)
    pad = (-predicted.size) % chunk
    p = jnp.pad(predicted, (0, pad), constant_values=num_classes)
    t = jnp.pad(target, (0, pad), constant_values=num_classes)
    p = p.reshape(-1, chunk)
    t = t.reshape(-1, chunk)

    def body(acc, pt):
        return acc + _confusion_chunk(pt[0], pt[1], num_classes), None

    acc, _ = jax.lax.scan(
        body, jnp.zeros((num_classes, num_classes), jnp.int32), (p, t))
    return acc


def _confusion_chunk(predicted, target, num_classes: int) -> jax.Array:
    # one_hot yields all-zero rows for out-of-range indices → safe padding.
    pred_oh = jax.nn.one_hot(predicted, num_classes, dtype=jnp.float32)
    targ_oh = jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
    conf = jnp.dot(targ_oh.T, pred_oh, preferred_element_type=jnp.float32)
    # int32 per-chunk counts; the host-side accumulator (eval.iou_eval) is int64.
    return conf.astype(jnp.int32)


def iou_from_confusion(conf: jax.Array, ignore_index: tuple = ()) -> jax.Array:
    """Per-class IoU from a confusion matrix; NaN where a class is absent.

    Mirrors ``IoU.value()`` (scripts/iou_eval.py:161-181): rows/cols of
    ignored classes are zeroed before TP/FP/FN extraction.
    """
    conf = conf.astype(jnp.float32)
    if ignore_index:
        idx = jnp.array(ignore_index)
        keep = jnp.ones(conf.shape[0], dtype=jnp.float32).at[idx].set(0.0)
        conf = conf * keep[:, None] * keep[None, :]
    tp = jnp.diag(conf)
    fp = conf.sum(0) - tp
    fn = conf.sum(1) - tp
    denom = tp + fp + fn
    return jnp.where(denom > 0, tp / jnp.maximum(denom, 1.0), jnp.nan)


def calculate_ious_device(
    pred: jax.Array,
    target: jax.Array,
    n_classes: int = 13,
    background_class: int = 12,
    ignore_class: int = 13,
) -> jax.Array:
    """jit-able equivalent of :func:`heatnet_tpu.eval.metrics.calculate_ious`.

    Pixels whose target is the ignore class are dropped from the union
    (utils.py:151-157); background/ignore classes are excluded from the
    returned vector, which therefore has ``n_classes - (#excluded <= n)``
    entries in class order.
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    valid = target != ignore_class

    classes = [c for c in range(n_classes) if c not in (background_class, ignore_class)]
    cls_arr = jnp.array(classes)  # (C,)

    pred_eq = pred[None, :] == cls_arr[:, None]  # (C, P)
    targ_eq = target[None, :] == cls_arr[:, None]

    inter = jnp.sum(pred_eq & targ_eq, axis=1).astype(jnp.float32)
    union = (
        jnp.sum(pred_eq & valid[None, :], axis=1)
        + jnp.sum(targ_eq & valid[None, :], axis=1)
    ).astype(jnp.float32) - inter

    return jnp.where(union > 0, inter / jnp.maximum(union, 1.0), jnp.nan)


def iou_counts(pred: jax.Array, target: jax.Array, n_classes: int = 13,
               ignore_class: int = 13) -> tuple:
    """Per-class (intersection, pred-count, target-count) sums on device.

    Accumulating these three (C,) vectors across an eval set and computing
    ``inter / (pred + target - inter)`` at the end reproduces
    ``calculate_ious`` over the concatenated tensors (utils.py:134-163)
    without materializing every frame on host (the reference preallocates
    len(loader)×H×W tensors — valid for 100 frames, not for production eval).
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    valid = target != ignore_class
    cls = jnp.arange(n_classes)[:, None]
    pred_eq = pred[None, :] == cls
    targ_eq = target[None, :] == cls
    inter = jnp.sum(pred_eq & targ_eq, axis=1)
    pred_cnt = jnp.sum(pred_eq & valid[None, :], axis=1)
    targ_cnt = jnp.sum(targ_eq & valid[None, :], axis=1)
    return inter, pred_cnt, targ_cnt


def ious_from_counts(inter, pred_cnt, targ_cnt,
                     skip=(12, 13)) -> "jnp.ndarray":
    """Final per-class IoU vector (NaN where absent), skipping given classes."""
    import numpy as np

    inter = np.asarray(inter, np.float64)
    union = np.asarray(pred_cnt, np.float64) + np.asarray(targ_cnt, np.float64) - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / np.maximum(union, 1), np.nan)
    keep = [c for c in range(len(iou)) if c not in skip]
    return iou[keep]
