#!/usr/bin/env python3
"""Drive-dump overlay renderer (reference data/visualize_data.py surface).

Thin shim over heatnet_tpu.cli.visualize_data — see that module for details.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from heatnet_tpu.cli.visualize_data import main

if __name__ == "__main__":
    main()
