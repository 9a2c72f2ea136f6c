#!/usr/bin/env python3
"""MFNet-harness demo entry point (reference mfnet/run_demo.py surface).

Thin shim over heatnet_tpu.cli.run_demo — see that module for details.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from heatnet_tpu.cli.run_demo import main

if __name__ == "__main__":
    main()
