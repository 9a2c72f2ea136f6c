"""Per-class IoU helper matching the HeatNet evaluation protocol.

Reference: ``calculate_ious`` in
``/root/reference/models/confusion_maximization/utils.py:134-163`` — boolean
mask IoU over classes 0..n-1, skipping class 12 (background) and 13 (ignore);
pixels whose *target* is the ignore class are excluded from the union; absent
classes yield NaN so they drop out of ``np.nanmean``.

Implemented vectorized on numpy (the reference loops per class on torch
tensors); for a jit-able on-device version see ``heatnet_tpu.ops.iou``.
"""

from __future__ import annotations

import numpy as np

BACKGROUND_CLASS_IDX = 12
IGNORE_CLASS_IDX = 13


def calculate_ious(pred, target, n_classes: int = 13) -> np.ndarray:
    """Per-class IoU, NaN for classes absent from both pred and target.

    Returns an array with one entry per evaluated class — classes 12/13 are
    skipped entirely (so for the default ``n_classes=13`` the result has 12
    entries, matching the 12 per-class wandb keys the reference logs).
    """
    pred = np.asarray(pred).reshape(-1)
    target = np.asarray(target).reshape(-1)

    valid = target != IGNORE_CLASS_IDX

    ious = []
    for cls in range(n_classes):
        if cls in (BACKGROUND_CLASS_IDX, IGNORE_CLASS_IDX):
            continue
        pred_inds = pred == cls
        target_inds = target == cls
        intersection = np.logical_and(pred_inds, target_inds).sum()
        union = (
            np.logical_and(pred_inds, valid).sum()
            + np.logical_and(target_inds, valid).sum()
            - intersection
        )
        if union == 0:
            ious.append(float("nan"))
        else:
            ious.append(float(intersection) / float(max(union, 1)))

    return np.array(ious)
