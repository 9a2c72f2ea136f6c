"""Drive-dump IR/RGB overlay renderer — the annotation viewer, headless.

Reference: ``data/visualize_data.py:11-214`` (``IrVisualizer``) — a Tkinter
app that pages through a raw drive dump, renders the aligned IR frame with
an adjustable radiometric window as a JET overlay on the RGB frame, and
saves ``<stamp>_{ir,rgb,overlay}.png`` triples for annotation. On a TPU pod
there is no display; this CLI renders the same triples for every (or a
range of) burst(s) in one pass, with the IR window and blend weight as
flags instead of sliders. The overlay math is identical
(:154-203: clamp→[0,1]→JET colormap→``cv2.addWeighted``).
"""

from __future__ import annotations

import argparse
import os


def normalize_ir(ir, ir_min: float, ir_max: float):
    """16-bit IR → JET-colormapped BGR uint8 (visualize_data.py:192-203)."""
    import cv2
    import numpy as np

    im = (ir.astype("float32") - ir_min) / (ir_max - ir_min)
    im = (im.clip(0, 1) * 255).astype("uint8")
    return cv2.applyColorMap(im, cv2.COLORMAP_JET)


def build_overlay(rgb_bgr, ir, ir_min: float, ir_max: float,
                  alpha: float = 0.7):
    """RGB/IR blend exactly as the viewer's build_overlay (:154-172)."""
    import cv2

    ir_cv = normalize_ir(ir, ir_min, ir_max)
    return cv2.addWeighted(rgb_bgr.astype("uint8"), alpha, ir_cv,
                           1.0 - alpha, 0.0)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Render IR/RGB overlay triples from a raw drive dump")
    p.add_argument("-s", "--src", required=True,
                   help="drive dump root (holds *_drive_*.txt path lists)")
    p.add_argument("--save-dir", required=True)
    p.add_argument("--ir-min", type=float, default=21800.0)
    p.add_argument("--ir-max", type=float, default=25000.0)
    p.add_argument("--alpha", type=float, default=0.7,
                   help="RGB weight in the blend (slider default :154)")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--limit", type=int, default=None,
                   help="max bursts to render")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import cv2

    from ..data.loaders import ThermalDriveDataset

    ds = ThermalDriveDataset(args.src, load_aligned_ir=True, load_right=False)
    os.makedirs(args.save_dir, exist_ok=True)

    end = len(ds) if args.limit is None else min(len(ds),
                                                 args.start + args.limit)
    n = 0
    for idx in range(args.start, end):
        item = ds[idx]
        if not item["ir_fl"]:
            continue
        name = os.path.splitext(os.path.basename(item["paths_left"][0]))[0]
        rgb_bgr = item["org_left"]  # BGR uint8, as the viewer keeps it
        ir = item["ir_fl"][0][..., 0]
        overlay = build_overlay(rgb_bgr, ir, args.ir_min, args.ir_max,
                                args.alpha)
        cv2.imwrite(os.path.join(args.save_dir, f"{name}_ir.png"),
                    ir.astype("uint16"))
        cv2.imwrite(os.path.join(args.save_dir, f"{name}_rgb.png"), rgb_bgr)
        cv2.imwrite(os.path.join(args.save_dir, f"{name}_overlay.png"),
                    overlay)
        n += 1
    print(f"Rendered {n} overlay triples into {args.save_dir}")
    return n


if __name__ == "__main__":
    main()
