"""Pack a capture directory into the raw-frame serving format.

Usage::

    python -m heatnet_tpu.cli.pack_frames --data DIR --out PACK_DIR

``DIR`` is a ``fl_rgb/ + fl_ir_aligned/`` tree (the ``scripts/inference.py``
input layout); ``PACK_DIR`` then serves through
``scripts/inference.py --data PACK_DIR`` with zero per-frame decode cost
(see ``heatnet_tpu.data.packed`` for the measured rationale).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True,
                   help="capture dir (fl_rgb/ + fl_ir_aligned/)")
    p.add_argument("--out", required=True, help="pack output directory")
    p.add_argument("--quiet", action="store_true")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..data.packed import pack_inference_dir

    n = pack_inference_dir(args.data, args.out, verbose=not args.quiet)
    print(f"packed {n} frames -> {args.out}")
    return n


if __name__ == "__main__":
    main()
