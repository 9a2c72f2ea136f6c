"""Packed raw-frame serving format: decode-free directory inference.

Motivation (measured, ``tools/bench_host_decode.py``): PNG decode of a
960x320 RGB + 16-bit IR pair costs ~15-25 ms of one host core — ~40-70
frames/sec/core — while one v5e chip serves 500 fps (int8) and a v5e-8
slice ~4000 fps. PNG-decoding at serve time therefore needs ~60-100 host
cores per slice just to keep up. Packing a capture directory ONCE into
contiguous raw arrays turns per-frame host work into a memmap slice
(microseconds): the decode cost is paid at pack time, never at serve time.

Layout of a pack directory::

    pack/
      meta.json   {"n": N, "height": H, "width": W, "names": [...],
                   "format": "heatnet-pack-v1"}
      rgb.npy     uint8  (N, H, W, 3)   — standard .npy, np.load mmap-able
      ir.npy      uint16 (N, H, W, 1)   — radiometric counts, unclamped

Frames are stored exactly as the eval loaders would ship them to the
device (resized to the 960x320 eval geometry, stride-aligned 148:852
window crop, raw sensor dtypes — see ``FreiburgInferDataset``); the
radiometric IR normalization stays in-graph on device, so a pack is
precision-identical to serving from the PNG tree.

The reference has no analog (its loaders re-decode PNGs in DataLoader
workers every epoch); this is TPU-era plumbing for keeping the chips fed.
"""

from __future__ import annotations

import json
import os
from typing import Dict

import numpy as np

FORMAT = "heatnet-pack-v1"
TRAIN_FORMAT = "heatnet-train-pack-v1"


def is_pack_dir(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "meta.json")) and \
        os.path.isfile(os.path.join(path, "rgb.npy"))


def is_train_pack_dir(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "meta.json")) and \
        os.path.isfile(os.path.join(path, "rgb_day.npy"))


def pack_inference_dir(src_dir: str, out_dir: str,
                       verbose: bool = False) -> int:
    """Pack a ``fl_rgb/ + fl_ir_aligned/`` capture directory.

    Decodes every frame through ``FreiburgInferDataset`` (same stamp sort,
    resize and window crop as PNG-tree serving) and writes the pack layout
    above. Returns the number of frames packed.
    """
    from .loaders import FreiburgInferDataset

    ds = FreiburgInferDataset(src_dir)
    n = len(ds)
    if n == 0:
        raise ValueError(f"no frames under {src_dir}")
    first = ds[0]
    h, w = first["rgb"].shape[1:3]

    os.makedirs(out_dir, exist_ok=True)
    rgb = np.lib.format.open_memmap(
        os.path.join(out_dir, "rgb.npy"), mode="w+", dtype=np.uint8,
        shape=(n, h, w, 3))
    ir = np.lib.format.open_memmap(
        os.path.join(out_dir, "ir.npy"), mode="w+", dtype=np.uint16,
        shape=(n, h, w, 1))
    names = []
    for i in range(n):
        item = first if i == 0 else ds[i]
        rgb[i] = item["rgb"][0]
        ir[i] = item["ir"][0]
        names.append(os.path.splitext(
            os.path.basename(ds.ir_files[i]))[0])
        if verbose and (i + 1) % 100 == 0:
            print(f"packed {i + 1}/{n}")
    rgb.flush()
    ir.flush()
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"format": FORMAT, "n": n, "height": h, "width": w,
                   "names": names}, f)
    return n


def pack_freiburg_train(db_path: str, out_dir: str, split: str = "train",
                        test_stamps=None, verbose: bool = False):
    """Pack a Freiburg Thermal train tree for decode-free training.

    Reuses ``FreiburgThermalDataset``'s discovery, day/night sort, holdout
    split and test-stamp filtering, then decodes each file ONCE (same
    resize) into five raw arrays: day rgb/ir/label and night rgb/ir. The
    paired-day + random-night sampling stays at serve time
    (``PackedFreiburgTrainDataset``), so training sees the same
    distribution as from the PNG tree. Returns (n_day, n_night).
    """
    import cv2

    from .loaders import IR_RES, _imread_ir16, _imread_rgb, _resize
    from .loaders import FreiburgThermalDataset

    ds = FreiburgThermalDataset(db_path, split=split,
                                test_stamps=test_stamps)
    n_day = len(ds.rgb_day_files)
    n_night = len(ds.rgb_night_files)
    w, h = IR_RES

    os.makedirs(out_dir, exist_ok=True)

    def _mm(name, dtype, shape):
        return np.lib.format.open_memmap(
            os.path.join(out_dir, name), mode="w+", dtype=dtype, shape=shape)

    rgb_day = _mm("rgb_day.npy", np.uint8, (n_day, h, w, 3))
    ir_day = _mm("ir_day.npy", np.uint16, (n_day, h, w))
    label_day = _mm("label_day.npy", np.uint8, (n_day, h, w))
    rgb_night = _mm("rgb_night.npy", np.uint8, (n_night, h, w, 3))
    ir_night = _mm("ir_night.npy", np.uint16, (n_night, h, w))

    for i in range(n_day):
        rgb_day[i] = _resize(_imread_rgb(ds.rgb_day_files[i]), IR_RES)
        ir_day[i] = _resize(_imread_ir16(ds.ir_day_files[i]), IR_RES)
        label_day[i] = _resize(
            cv2.imread(ds.label_day_files[i], cv2.IMREAD_GRAYSCALE),
            IR_RES, nearest=True)
        if verbose and (i + 1) % 100 == 0:
            print(f"packed day {i + 1}/{n_day}")
    for i in range(n_night):
        rgb_night[i] = _resize(_imread_rgb(ds.rgb_night_files[i]), IR_RES)
        ir_night[i] = _resize(_imread_ir16(ds.ir_night_files[i]), IR_RES)
        if verbose and (i + 1) % 100 == 0:
            print(f"packed night {i + 1}/{n_night}")
    for arr in (rgb_day, ir_day, label_day, rgb_night, ir_night):
        arr.flush()
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"format": TRAIN_FORMAT, "split": split,
                   "n_day": n_day, "n_night": n_night,
                   "height": h, "width": w,
                   "test_stamps_filtered": bool(test_stamps)}, f)
    return n_day, n_night


class PackedFreiburgTrainDataset:
    """Serve a train pack with the ``FreiburgThermalDataset`` surface.

    Same item dict (uint8 rgb / uint16 ir / uint8 label, day + random
    night) and the same seeded night-pairing RNG semantics; per item the
    host does five memmap slices instead of five PNG decodes + resizes.
    """

    def __init__(self, pack_dir: str, seed: int = 0):
        with open(os.path.join(pack_dir, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta.get("format") != TRAIN_FORMAT:
            raise ValueError(f"not a {TRAIN_FORMAT} directory: {pack_dir}")
        ld = lambda n: np.load(os.path.join(pack_dir, n), mmap_mode="r")
        self.rgb_day = ld("rgb_day.npy")
        self.ir_day = ld("ir_day.npy")
        self.label_day = ld("label_day.npy")
        self.rgb_night = ld("rgb_night.npy")
        self.ir_night = ld("ir_night.npy")
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return int(self.meta["n_day"])

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rand_idx = self._rng.randint(0, int(self.meta["n_night"]))
        return {
            "rgb_day": np.asarray(self.rgb_day[index]),
            "ir_day": np.asarray(self.ir_day[index]),
            "label_day": np.asarray(self.label_day[index]),
            "rgb_night": np.asarray(self.rgb_night[rand_idx]),
            "ir_night": np.asarray(self.ir_night[rand_idx]),
        }


class PackedFrameDataset:
    """Serve a pack directory with the ``FreiburgInferDataset`` surface.

    ``__getitem__`` is a memmap slice + one cheap f32 vis conversion — no
    image decode. Drop-in for the inference CLI/validators (same dict
    keys), so ``--batch`` serving runs at device speed from one host core.
    """

    def __init__(self, pack_dir: str):
        with open(os.path.join(pack_dir, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta.get("format") != FORMAT:
            raise ValueError(f"not a {FORMAT} directory: {pack_dir}")
        self.rgb = np.load(os.path.join(pack_dir, "rgb.npy"), mmap_mode="r")
        self.ir = np.load(os.path.join(pack_dir, "ir.npy"), mmap_mode="r")
        self.names = self.meta["names"]

    def __len__(self):
        return int(self.meta["n"])

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rgb = np.asarray(self.rgb[index])
        ir = np.asarray(self.ir[index])
        ir_vis = (np.clip(ir.astype(np.float32), 21800, 25000)
                  - 21800) / 3200.0
        return {
            "rgb": rgb[None],
            "rgb_org": rgb[None],
            "ir": ir[None],
            "ir_org": ir_vis[None],
        }
