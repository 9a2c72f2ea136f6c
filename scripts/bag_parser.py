#!/usr/bin/env python3
"""Capture dump driver (reference data/bag_parser.py surface, no ROS)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from heatnet_tpu.cli.dump_capture import main

if __name__ == "__main__":
    main()
