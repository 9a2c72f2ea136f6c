#!/usr/bin/env python3
"""HeatNet adversarial trainer (reference train_trgb_segnet_conf.py surface)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from heatnet_tpu.cli.train_conf import main

if __name__ == "__main__":
    main()
