#!/usr/bin/env python3
"""Vistas pretraining entry point (reference scripts/main.py surface).

Thin shim over heatnet_tpu.cli.main — see that module for the rebuild notes.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from heatnet_tpu.cli.main import main

if __name__ == "__main__":
    main()
