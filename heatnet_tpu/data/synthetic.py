"""Synthetic tiny datasets in the reference on-disk layouts.

Used by the test suite and CLI smoke runs (the reference datasets are not
distributable). Layouts follow thermal_loader.py / vistas_dataset.py /
getPaths exactly, so the loaders' glob logic is exercised for real.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np


def _write_png(path: str, arr: np.ndarray) -> None:
    import cv2

    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, arr)


def make_freiburg_train(root: str, n_day: int = 4, n_night: int = 3,
                        hw: Tuple[int, int] = (64, 192), seed: int = 0) -> str:
    """db_path/*/*/fl_{rgb,ir_aligned,rgb_labels}/*.png tree."""
    rng = np.random.RandomState(seed)
    h, w = hw
    # sibling paths derive via full-path replace('fl_ir_aligned', 'fl_rgb'),
    # so directory AND filename prefix must both follow the convention
    for i in range(n_day):
        base = os.path.join(root, "seq00_day", "drive0")
        stamp = f"{1500000000 + i}_{i * 1000:09d}.png"
        _write_png(os.path.join(base, "fl_ir_aligned", "fl_ir_aligned_" + stamp),
                   rng.randint(21000, 26000, (h, w)).astype(np.uint16))
        _write_png(os.path.join(base, "fl_rgb", "fl_rgb_" + stamp),
                   rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
        _write_png(os.path.join(base, "fl_rgb_labels", "fl_rgb_labels_" + stamp),
                   rng.randint(0, 13, (h, w)).astype(np.uint8))
    for i in range(n_night):
        base = os.path.join(root, "seq01_night", "drive0")
        stamp = f"{1600000000 + i}_{i * 1000:09d}.png"
        _write_png(os.path.join(base, "fl_ir_aligned", "fl_ir_aligned_" + stamp),
                   rng.randint(21000, 26000, (h, w)).astype(np.uint16))
        _write_png(os.path.join(base, "fl_rgb", "fl_rgb_" + stamp),
                   rng.randint(0, 40, (h, w, 3)).astype(np.uint8))
    return root


def make_freiburg_test(root: str, n: int = 2,
                       hw: Tuple[int, int] = (64, 192), seed: int = 1) -> str:
    """ImagesIR/ImagesRGB/SegmentationClass layout (getPaths)."""
    rng = np.random.RandomState(seed)
    h, w = hw
    os.makedirs(os.path.join(root, "SegmentationClass"), exist_ok=True)
    for i in range(n):
        stamp = f"{1700000000 + i}_{i * 100:09d}"
        _write_png(os.path.join(root, "ImagesIR", f"{stamp}_ir.png"),
                   rng.randint(21000, 26000, (h, w)).astype(np.uint16))
        _write_png(os.path.join(root, "ImagesRGB", f"{stamp}_rgb.png"),
                   rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
        np.save(os.path.join(root, "SegmentationClass", f"{stamp}.npy"),
                rng.randint(0, 13, (h, w)).astype(np.uint8))
    return root


def make_freiburg_infer(root: str, n: int = 2,
                        hw: Tuple[int, int] = (64, 192), seed: int = 2) -> str:
    rng = np.random.RandomState(seed)
    h, w = hw
    for i in range(n):
        stamp = f"{1800000000 + i}_{i * 1000:09d}.png"
        _write_png(os.path.join(root, "fl_ir_aligned", "fl_ir_aligned_" + stamp),
                   rng.randint(21000, 26000, (h, w)).astype(np.uint16))
        _write_png(os.path.join(root, "fl_rgb", "fl_rgb_" + stamp),
                   rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
    return root


def make_mfnet(root: str, n_train: int = 4, n_test: int = 2,
               hw: Tuple[int, int] = (48, 64), seed: int = 3) -> str:
    """MFNet layout: 4-channel images/, labels/, labels_from_rgbteacher/,
    train.txt / test_day.txt / test_night.txt / test.txt."""
    rng = np.random.RandomState(seed)
    h, w = hw
    names_train, names_day, names_night = [], [], []
    for i in range(n_train):
        suffix = "D" if i % 2 == 0 else "N"
        name = f"{i:05d}{suffix}"
        img = rng.randint(0, 255, (h, w, 4)).astype(np.uint8)
        _write_png(os.path.join(root, "images", name + ".png"), img)
        _write_png(os.path.join(root, "labels", name + ".png"),
                   rng.randint(0, 9, (h, w)).astype(np.uint8))
        _write_png(os.path.join(root, "labels_from_rgbteacher", name + ".png"),
                   rng.randint(0, 13, (h, w)).astype(np.uint8))
        names_train.append(name)
    for i in range(n_test):
        for suffix, bucket in (("D", names_day), ("N", names_night)):
            name = f"9{i:04d}{suffix}"
            _write_png(os.path.join(root, "images", name + ".png"),
                       rng.randint(0, 255, (h, w, 4)).astype(np.uint8))
            _write_png(os.path.join(root, "labels", name + ".png"),
                       rng.randint(0, 9, (h, w)).astype(np.uint8))
            bucket.append(name)
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(names_train))
    with open(os.path.join(root, "test_day.txt"), "w") as f:
        f.write("\n".join(names_day))
    with open(os.path.join(root, "test_night.txt"), "w") as f:
        f.write("\n".join(names_night))
    with open(os.path.join(root, "test.txt"), "w") as f:
        f.write("\n".join(names_day + names_night))
    return root


def make_bdd(root: str, n: int = 2, hw: Tuple[int, int] = (48, 96),
             seed: int = 4) -> str:
    rng = np.random.RandomState(seed)
    h, w = hw
    names = []
    for i in range(n):
        name = f"bdd{i:04d}"
        _write_png(os.path.join(root, "images", "val", name + ".jpg"),
                   rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
        lbl = rng.randint(0, 19, (h, w)).astype(np.uint8)
        lbl[0, 0] = 255
        _write_png(os.path.join(root, "labels", "val", name + "_train_id.png"), lbl)
        names.append(name)
    with open(os.path.join(root, "bdd_night.txt"), "w") as f:
        f.write("\n".join(names))
    return root


def make_vistas(root: str, n: int = 3, hw: Tuple[int, int] = (48, 96),
                seed: int = 5) -> str:
    """Relabelled-Vistas layout consumed by VistasDataset: images/ + labels/
    (uint16 class*256+instance pngs) + paths.txt."""
    rng = np.random.RandomState(seed)
    h, w = hw
    names = []
    for i in range(n):
        name = f"v{i:05d}"
        _write_png(os.path.join(root, "images", name + ".png"),
                   rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
        cls = rng.randint(0, 14, (h, w)).astype(np.uint16)
        _write_png(os.path.join(root, "labels", name + ".png"),
                   (cls * 256).astype(np.uint16))
        names.append(name)
    with open(os.path.join(root, "paths.txt"), "w") as f:
        f.write("\n".join(names))
    return root


def make_kaist(root: str, n_day: int = 3, n_night: int = 3,
               hw: Tuple[int, int] = (64, 80), seed: int = 6) -> str:
    """KAIST layout for the CycleGAN loader (Day/set00..., Night/set04...)."""
    rng = np.random.RandomState(seed)
    h, w = hw
    for i in range(n_day):
        base = os.path.join(root, "Day", "set00", "V000")
        _write_png(os.path.join(base, "lwir", f"I{i:05d}.jpg"),
                   rng.randint(0, 255, (h, w)).astype(np.uint8))
        _write_png(os.path.join(base, "visible", f"I{i:05d}.jpg"),
                   rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
        _write_png(os.path.join(base, "labels", f"I{i:05d}.png"),
                   rng.randint(0, 12, (h, w)).astype(np.uint8))
    for i in range(n_night):
        base = os.path.join(root, "Night", "set04", "V000")
        _write_png(os.path.join(base, "lwir", f"I{i:05d}.jpg"),
                   rng.randint(0, 100, (h, w)).astype(np.uint8))
    return root


def make_drive_dump(root: str, n_drives: int = 2, n_bursts: int = 2,
                    burst: int = 2, hw: Tuple[int, int] = (48, 64),
                    seed: int = 7) -> str:
    """Raw-dump drive layout for ThermalDriveDataset
    (data/thermal_loader.py:46-152): per-drive ``{fl,fr}_{rgb,ir}`` frame
    dirs plus ``*_drive_*.txt`` lists of space-separated burst paths; also
    fl_ir_aligned/ siblings for the load_aligned_ir remap."""
    rng = np.random.RandomState(seed)
    h, w = hw
    for d in range(n_drives):
        base = os.path.join(root, f"drive_{d:02d}")
        lists = {k: [] for k in ("fl_rgb", "fr_rgb", "fl_ir", "fr_ir")}
        for b in range(n_bursts):
            for k in lists:
                paths = []
                for j in range(burst):
                    name = f"{k}_{d}{b}{j:07d}.png"
                    p = os.path.join(base, k, name)
                    if "rgb" in k:
                        _write_png(p, rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
                    else:
                        _write_png(p, rng.randint(21000, 26000, (h, w)).astype(np.uint16))
                    paths.append(p)
                lists[k].append(" ".join(paths))
            # aligned sibling for fl_ir
            for j in range(burst):
                name = f"fl_ir_aligned_{d}{b}{j:07d}.png"
                _write_png(os.path.join(base, "fl_ir_aligned", name),
                           rng.randint(21000, 26000, (h, w)).astype(np.uint16))
        for k, lines in lists.items():
            with open(os.path.join(base, f"{k}_drive_{d:02d}.txt"), "w") as f:
                f.write("\n".join(lines))
    return root


def make_vistas_borders(root: str, n: int = 3, hw: Tuple[int, int] = (64, 96),
                        seed: int = 8) -> str:
    """Borders-augmented Vistas layout for VistasBordersDataset
    (data/vistas_borders_dataset.py:55-66): a paths.txt with 4 paths per
    line — borders, trainIds (class*256+instance), image, dt."""
    rng = np.random.RandomState(seed)
    h, w = hw
    lines = []
    for i in range(n):
        name = f"b{i:05d}"
        borders = (rng.rand(h, w) > 0.9).astype(np.uint8)
        bp = os.path.join(root, "borders", name + ".png")
        _write_png(bp, borders)
        ids = (rng.randint(0, 12, (h, w)) * 256
               + rng.randint(0, 5, (h, w))).astype(np.uint16)
        ip = os.path.join(root, "ids", name + ".png")
        _write_png(ip, ids)
        img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
        mp = os.path.join(root, "images", name + ".png")
        _write_png(mp, img)
        dt = rng.randint(0, 255, (h, w)).astype(np.uint8)
        dp = os.path.join(root, "dt", name + ".png")
        _write_png(dp, dt)
        lines.append(" ".join([bp, ip, mp, dp]))
    path_file = os.path.join(root, "paths.txt")
    with open(path_file, "w") as f:
        f.write("\n".join(lines))
    return path_file
