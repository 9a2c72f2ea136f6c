"""Metric parity tests: ConfusionMatrix / IoU / calculate_ious semantics.

The reference publishes no tests; expected values here are derived from the
documented protocols (scripts/iou_eval.py:161-181, utils.py:134-163) and
cross-checked between the numpy and on-device implementations.
"""

import numpy as np
import pytest

from heatnet_tpu.eval.iou_eval import ConfusionMatrix, IoU
from heatnet_tpu.eval.metrics import calculate_ious


def test_confusion_matrix_counts():
    cm = ConfusionMatrix(3)
    cm.add(np.array([0, 1, 2, 1]), np.array([0, 1, 1, 1]))
    conf = cm.value()
    assert conf[0, 0] == 1
    assert conf[1, 1] == 2
    assert conf[1, 2] == 1
    assert conf.sum() == 4


def test_confusion_matrix_accumulates():
    cm = ConfusionMatrix(2)
    cm.add(np.array([0, 1]), np.array([0, 1]))
    cm.add(np.array([0, 1]), np.array([0, 1]))
    assert cm.value()[0, 0] == 2 and cm.value()[1, 1] == 2


def test_iou_perfect_prediction():
    m = IoU(3)
    pred = np.zeros((1, 4, 4), dtype=np.int64)
    pred[0, :2] = 1
    m.add(pred, pred.copy())
    iou, miou = m.value()
    np.testing.assert_allclose(iou[:2], [1.0, 1.0])
    assert np.isnan(iou[2])  # class 2 absent
    assert miou == pytest.approx(1.0)


def test_iou_ignore_index_zeroes_rows_cols():
    # protocol of scripts/main.py:278 — IoU(14, False, [12, 13])
    m = IoU(14, False, [12, 13])
    pred = np.full((1, 2, 2), 12, dtype=np.int64)
    target = np.full((1, 2, 2), 12, dtype=np.int64)
    pred[0, 0, 0] = 0
    target[0, 0, 0] = 0
    m.add(pred, target)
    iou, miou = m.value()
    assert iou[0] == pytest.approx(1.0)
    assert np.isnan(iou[12]) and np.isnan(iou[13])
    assert miou == pytest.approx(1.0)


def test_iou_value_does_not_mutate_accumulator():
    m = IoU(14, False, [12, 13])
    pred = np.full((1, 2, 2), 12, dtype=np.int64)
    m.add(pred, pred.copy())
    before = m.conf_metric.conf.copy()
    m.value()
    np.testing.assert_array_equal(m.conf_metric.conf, before)


def test_calculate_ious_basic():
    # 4 classes of interest on a 4x4 grid
    target = np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]])
    pred = target.copy()
    pred[0, 0] = 1  # one class-0 pixel mispredicted as class 1
    ious = calculate_ious(pred[None], target[None])
    assert len(ious) == 12  # classes 0..11 (12 background excluded, 13 ignore)
    assert ious[0] == pytest.approx(3 / 4)  # class 0: inter 3, union 4
    assert ious[1] == pytest.approx(4 / 5)  # class 1: inter 4, union 5
    assert ious[2] == pytest.approx(1.0)
    assert np.isnan(ious[4])  # absent class


def test_calculate_ious_ignore_pixels_excluded_from_union():
    target = np.array([[0, 13], [13, 13]])
    pred = np.array([[0, 0], [0, 0]])
    ious = calculate_ious(pred[None], target[None])
    # ignore-target pixels don't count as false positives
    assert ious[0] == pytest.approx(1.0)


def test_device_ops_match_numpy():
    from heatnet_tpu.ops.iou import confusion_matrix, iou_from_confusion, calculate_ious_device

    rng = np.random.RandomState(0)
    pred = rng.randint(0, 14, size=(2, 8, 8))
    target = rng.randint(0, 14, size=(2, 8, 8))

    conf_dev = np.asarray(confusion_matrix(pred, target, 14))
    cm = ConfusionMatrix(14)
    cm.add(pred.reshape(-1), target.reshape(-1))
    np.testing.assert_array_equal(conf_dev, cm.value())

    iou_dev = np.asarray(iou_from_confusion(conf_dev, ignore_index=(12, 13)))
    ref = IoU(14, False, [12, 13])
    ref.add(pred, target)
    iou_ref, _ = ref.value()
    np.testing.assert_allclose(iou_dev, iou_ref.astype(np.float32), rtol=1e-6)

    ious_dev = np.asarray(calculate_ious_device(pred, target))
    ious_ref = calculate_ious(pred, target)
    np.testing.assert_allclose(ious_dev, ious_ref.astype(np.float32), rtol=1e-6)
