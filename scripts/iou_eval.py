#!/usr/bin/env python3
"""Bit-compatible import surface for the reference scripts/iou_eval.py."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from heatnet_tpu.eval.iou_eval import ConfusionMatrix, IoU, Metric  # noqa: F401
