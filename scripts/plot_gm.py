#!/usr/bin/env python3
"""GPS heatmap harvest/plot (reference data/plot_gm.py surface, offline)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from heatnet_tpu.cli.plot_heatmap import main

if __name__ == "__main__":
    main()
