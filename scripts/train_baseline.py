#!/usr/bin/env python3
"""Entry-point shim over heatnet_tpu.cli.train_baseline (reference surface)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from heatnet_tpu.cli.train_baseline import main

if __name__ == "__main__":
    main()
