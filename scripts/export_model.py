#!/usr/bin/env python3
"""Export a trained model to a self-contained AOT serving artifact."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from heatnet_tpu.cli.export_model import main

if __name__ == "__main__":
    main()
