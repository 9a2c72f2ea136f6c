#!/usr/bin/env python3
"""Convert a reference torch .pth checkpoint into an orbax checkpoint."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from heatnet_tpu.cli.convert_checkpoint import main

if __name__ == "__main__":
    main()
