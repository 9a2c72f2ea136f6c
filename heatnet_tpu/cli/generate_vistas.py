"""Vistas dataset builder — ``generate_vista_dataset.py`` surface.

Reference (``/root/reference/data/datasets/generate_vista_dataset.py:32-69``):
resize each Mapillary Vistas image to width 1024 (aspect preserved), remap
the 66-class panoptic labels to the 13-class HeatNet space via the native
relabel kernel, write ``images/``, ``labels/`` and ``paths.txt``.
"""

from __future__ import annotations

import argparse
import os
from glob import glob


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument('--print_labels', action='store_true',
                   help='print the class ids + Vistas→IROS mapping '
                        '(print_label_names.py surface) and exit')
    p.add_argument('--vistas_root', required=False, default='',
                   help='Mapillary Vistas root (training/images + v1.2/instances)')
    p.add_argument('--out', required=False, default='',
                   help='output dataset directory')
    p.add_argument('--width', type=int, default=1024)
    p.add_argument('--limit', type=int, default=None)
    p.add_argument('--use_native', action='store_true', default=True)
    p.add_argument('--no_native', dest='use_native', action='store_false')
    return p


def print_labels() -> None:
    """Class ids + Vistas→IROS mapping (print_label_names.py:1-23)."""
    from ..data.mappings import CLASS_NAMES, VISTAS_TO_HEATNET

    for i, name in enumerate(CLASS_NAMES):
        print('ID: %i: %s' % (i, name))
    print('################ Mapping ############################')
    for i, name in enumerate(CLASS_NAMES):
        srcs = sorted(k for k, v in VISTAS_TO_HEATNET.items() if v == i)
        print('Map: %s -> vistas ids %s' % (name, srcs))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.print_labels:
        print_labels()
        return 0
    if not args.vistas_root or not args.out:
        raise SystemExit("--vistas_root and --out are required")

    import cv2
    import numpy as np

    from ..data.mappings import VISTAS_TO_HEATNET, relabel_vistas_image

    relabel = relabel_vistas_image
    if args.use_native:
        try:
            from ..native import relabel_vistas_image_native

            relabel = relabel_vistas_image_native
        except Exception as e:  # native build unavailable → python fallback
            print(f"native relabeller unavailable ({e}); using python path")

    img_files = sorted(glob(os.path.join(args.vistas_root,
                                         "training/images/*.jpg")))
    img_files += sorted(glob(os.path.join(args.vistas_root,
                                          "training/images/*.png")))
    if args.limit:
        img_files = img_files[:args.limit]

    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)
    os.makedirs(os.path.join(args.out, "labels"), exist_ok=True)
    names = []
    for i, img_file in enumerate(img_files):
        stem = os.path.splitext(os.path.basename(img_file))[0]
        label_file = None
        for cand in ("v1.2/instances", "training/instances", "instances"):
            c = os.path.join(args.vistas_root, cand.replace(
                "instances", "training/instances") if cand == "instances"
                else cand, stem + ".png")
            if os.path.isfile(c):
                label_file = c
                break
        if label_file is None:
            continue
        img = cv2.imread(img_file)
        inst = cv2.imread(label_file, -1).astype(np.uint16)

        h, w = img.shape[:2]
        new_h = int(round(h * args.width / w))
        img = cv2.resize(img, (args.width, new_h), interpolation=cv2.INTER_LINEAR)
        inst = cv2.resize(inst, (args.width, new_h),
                          interpolation=cv2.INTER_NEAREST)

        relabelled = np.asarray(relabel(inst, VISTAS_TO_HEATNET))
        cv2.imwrite(os.path.join(args.out, "images", stem + ".png"), img)
        cv2.imwrite(os.path.join(args.out, "labels", stem + ".png"), relabelled)
        names.append(stem)
        if i % 100 == 0:
            print(f"{i}/{len(img_files)} processed")

    with open(os.path.join(args.out, "paths.txt"), "w") as f:
        f.write("\n".join(names))
    print(f"wrote {len(names)} pairs to {args.out}")
    return len(names)


if __name__ == "__main__":
    main()
