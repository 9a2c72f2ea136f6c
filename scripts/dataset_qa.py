#!/usr/bin/env python3
"""Dataset QA entry point (reference data/validate_*_dataset.py +
get_dataset_stats.py surfaces).

Thin shim over heatnet_tpu.cli.dataset_qa — see that module for details.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from heatnet_tpu.cli.dataset_qa import main

if __name__ == "__main__":
    main()
