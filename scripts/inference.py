#!/usr/bin/env python3
"""Timed single-frame inference (reference scripts/inference.py surface)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from heatnet_tpu.cli.inference import main

if __name__ == "__main__":
    main()
