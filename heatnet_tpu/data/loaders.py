"""Host-side dataset loaders for the Freiburg Thermal / MFNet / BDD corpora.

Reference: ``models/confusion_maximization/thermal_loader.py`` — file layouts,
day/night sorting, the 1% holdout split, and the decode/resize geometry are
reproduced exactly:

- ``FreiburgThermalDataset`` ↔ ``ThermalDataLoader`` (:501-746): globs
  ``*/*/fl_rgb|fl_rgb_labels|fl_ir_aligned/*.png``, day/night split by path +
  label existence (``sort_day_night``, :105-150), sklearn ``train_test_split``
  1% seed 42 (:525-540), paired day sample + random night sample (:604-608),
  16-bit IR decode (:612), resize to 960x320 (:622-627).
- ``FreiburgThermalTestDataset`` ↔ ``ThermalTestDataLoader`` (:748-820):
  ``.npy`` labels, crop 148:852 → 320x704.
- ``MFNetDataset``/``MFNetTrainDataset`` ↔ ``MFDataset``/``MFDatasetTrain``
  (:224-440): 4-channel PNGs, 640x480, day/night name suffixes.
- ``BDDValDataset`` ↔ (:445-498): ``bdd_night.txt``, 704x320.
- ``FreiburgInferDataset`` ↔ ``ThermalDataLoaderInfer`` (:152-221):
  timestamp-sorted full frames.

TPU-native split of responsibilities: loaders only DECODE + RESIZE on host
(cv2, matching the reference's interpolation); all augmentation/normalization
runs batched on device via :class:`DeviceAugment` (ops.preprocess), replacing
the per-item torch worker-process chain. ``batch_iterator`` adds background
prefetch.
"""

from __future__ import annotations

import fnmatch
import os
import queue
import threading
from glob import glob
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in the image
    cv2 = None

IR_RES = (960, 320)  # (W, H), thermal_loader.py:622


def _imread_rgb(path: str) -> np.ndarray:
    img = cv2.imread(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _imread_ir16(path: str) -> np.ndarray:
    return cv2.imread(path, cv2.IMREAD_ANYDEPTH)


def _resize(img: np.ndarray, wh: Tuple[int, int], nearest: bool = False) -> np.ndarray:
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(img, wh, interpolation=interp)


def stamp_sort_key(path: str) -> float:
    """Timestamp sort key (stampSortFun, thermal_loader.py:80-90)."""
    digits = []
    for s in os.path.basename(path).split("_"):
        fn = s.replace(".png", "")
        if fn.isdigit():
            digits.append(int(fn))
    return float(str(digits[0]).zfill(10) + "." + str(digits[1]).zfill(10))


def sort_day_night(fl_ir_files: Sequence[str]):
    """Split aligned-IR file list into day (labeled) and night sets
    (sort_day_night, thermal_loader.py:105-150)."""
    day_rgb, day_ir, day_label = [], [], []
    night_rgb, night_ir = [], []
    for ir_file in fl_ir_files:
        rgb_file = ir_file.replace("fl_ir_aligned", "fl_rgb")
        label_file = ir_file.replace("fl_ir_aligned", "fl_rgb_labels")
        if not os.path.exists(rgb_file):
            continue
        if "night" in ir_file:
            night_rgb.append(rgb_file)
            night_ir.append(ir_file)
        else:
            if not os.path.exists(label_file):
                continue
            day_rgb.append(rgb_file)
            day_ir.append(ir_file)
            day_label.append(label_file)
    return day_rgb, day_ir, day_label, night_rgb, night_ir


def holdout_split(items: List, test_size: float = 0.01, seed: int = 42):
    """sklearn ``train_test_split(..., random_state=42)`` equivalent split
    indices (thermal_loader.py:525-540) applied to parallel lists."""
    from sklearn.model_selection import train_test_split

    idx = list(range(len(items[0])))
    train_idx, test_idx = train_test_split(idx, test_size=test_size,
                                           random_state=seed)
    take = lambda lst, ids: [lst[i] for i in ids]
    return ([take(l, train_idx) for l in items],
            [take(l, test_idx) for l in items])


class FreiburgThermalDataset:
    """Paired day + random-night raw sample loader (decode + resize only)."""

    def __init__(self, db_path: str, split: str = "train",
                 test_stamps=None, seed: int = 0):
        fl_ir_files = sorted(glob(os.path.join(db_path, "*/*/fl_ir_aligned/*.png")))
        if test_stamps:
            fl_ir_files = filter_test_data(fl_ir_files, test_stamps)
        day_rgb, day_ir, day_label, night_rgb, night_ir = sort_day_night(fl_ir_files)
        if not day_rgb or not night_rgb:
            raise FileNotFoundError(
                f"no Freiburg Thermal data under {db_path!r}: found "
                f"{len(fl_ir_files)} aligned-IR files, {len(day_rgb)} labeled "
                "day pairs, {} night pairs (expected */*/fl_ir_aligned/*.png "
                "with fl_rgb/fl_rgb_labels siblings)".format(len(night_rgb)))

        (day_train, day_test) = holdout_split([day_rgb, day_ir, day_label])
        (night_train, night_test) = holdout_split([night_rgb, night_ir])
        if split == "train":
            day, night = day_train, night_train
        elif split == "test":
            day, night = day_test, night_test
        else:
            raise ValueError(f"unknown split {split}")

        self.rgb_day_files, self.ir_day_files, self.label_day_files = day
        self.rgb_night_files, self.ir_night_files = night
        self._rng = np.random.RandomState(seed)
        if not self.rgb_day_files or not self.rgb_night_files:
            raise FileNotFoundError(
                f"no day/night pairs under {db_path} (found "
                f"{len(self.rgb_day_files)} day, {len(self.rgb_night_files)} night)")

    def __len__(self) -> int:
        return len(self.rgb_day_files)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rand_idx = self._rng.randint(0, len(self.rgb_night_files))
        rgb_day = _resize(_imread_rgb(self.rgb_day_files[index]), IR_RES)
        ir_day = _resize(_imread_ir16(self.ir_day_files[index]), IR_RES)
        label_day = _resize(
            cv2.imread(self.label_day_files[index], cv2.IMREAD_GRAYSCALE),
            IR_RES, nearest=True)
        rgb_night = _resize(_imread_rgb(self.rgb_night_files[rand_idx]), IR_RES)
        ir_night = _resize(_imread_ir16(self.ir_night_files[rand_idx]), IR_RES)
        return {
            "rgb_day": rgb_day.astype(np.uint8),
            "ir_day": ir_day.astype(np.uint16),
            "label_day": label_day.astype(np.uint8),
            "rgb_night": rgb_night.astype(np.uint8),
            "ir_night": ir_night.astype(np.uint16),
        }


def open_freiburg_train(db_path: str, split: str = "train",
                        test_stamps=None, seed: int = 0):
    """``FreiburgThermalDataset`` or its decode-free packed equivalent.

    If ``db_path`` is a train pack (``cli/pack_frames.py --train``) the
    memmap-backed ``PackedFreiburgTrainDataset`` is returned (test-stamp
    filtering was baked at pack time); otherwise the PNG-tree loader.
    Every trainer opens its Freiburg training data through this.

    A pack's baked-in choices are cross-checked against the caller's:
    requesting a different ``split``, or passing ``test_stamps`` to a pack
    built without test-stamp filtering, would silently train on eval
    frames (test-set leakage) — both raise instead.
    """
    import json

    from .packed import PackedFreiburgTrainDataset, is_train_pack_dir

    if is_train_pack_dir(db_path):
        with open(os.path.join(db_path, "meta.json")) as f:
            meta = json.load(f)
        if meta.get("split", "train") != split:
            raise ValueError(
                f"train pack {db_path} was packed with split="
                f"{meta.get('split', 'train')!r} but split={split!r} was "
                f"requested; re-pack with cli/pack_frames.py --split {split}")
        if test_stamps is not None and len(test_stamps) > 0 \
                and not meta.get("test_stamps_filtered", False):
            raise ValueError(
                f"train pack {db_path} was packed WITHOUT test-stamp "
                "filtering but --testroot_* test stamps were passed; "
                "training on it would include eval frames. Re-pack with "
                "cli/pack_frames.py --testroot_day/--testroot_night")
        return PackedFreiburgTrainDataset(db_path, seed=seed)
    return FreiburgThermalDataset(db_path, split=split,
                                  test_stamps=test_stamps, seed=seed)


def filter_test_data(paths: Sequence[str], stamps) -> List[str]:
    """Exclude files whose (sec, nsec) stamp appears in ``stamps``.

    NOTE: the reference implementation (thermal_loader.py:60-78) keeps a file
    if it mismatches ANY stamp — i.e. it effectively filters nothing (SURVEY
    §7 known defects). We implement the evident intent (exclude exact
    matches) rather than the bug.
    """
    stamp_set = {tuple(t) for t in stamps}
    out = []
    for p in paths:
        digits = [int(s) for s in
                  os.path.basename(p).replace(".", "_").split("_") if s.isdigit()]
        if len(digits) >= 2 and (digits[0], digits[1]) in stamp_set:
            continue
        out.append(p)
    return out


def get_test_paths(db_paths: Sequence[str]):
    """ImagesIR/ImagesRGB/SegmentationClass discovery
    (train_trgb_segnet_conf.py getPaths, :22-30)."""
    ir_files, rgb_files, label_files = [], [], []
    for d in db_paths:
        ir_files.extend(sorted(glob(os.path.join(d, "ImagesIR/*_ir.png"))))
        rgb_files.extend(sorted(glob(os.path.join(d, "ImagesRGB/*_rgb.png"))))
        label_files.extend(sorted(glob(os.path.join(d, "SegmentationClass/*.npy"))))
    return ir_files, rgb_files, label_files


def get_test_stamps(label_files: Sequence[str]):
    """(sec, nsec) stamps of labeled test files (conf trainer :88-98).

    The extension is stripped before splitting (the reference splits the raw
    path, so a trailing ``<nsec>.npy`` token fails ``isdigit`` — evident
    intent restored)."""
    stamps = []
    for filename in label_files:
        stem = os.path.splitext(os.path.basename(filename))[0]
        digits = [int(s) for s in stem.split("_") if s.isdigit()]
        if len(digits) >= 2:
            stamps.append((digits[0], digits[1]))
    return stamps


class FreiburgThermalTestDataset:
    """Eval loader: 320x704 window, normalized outputs
    (ThermalTestDataLoader, :748-820)."""

    def __init__(self, ir_paths, rgb_paths, label_paths):
        assert len(ir_paths) == len(rgb_paths) == len(label_paths)
        self.ir_files, self.rgb_files, self.label_files = ir_paths, rgb_paths, label_paths

    def __len__(self):
        return len(self.rgb_files)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rgb = _resize(_imread_rgb(self.rgb_files[index]), IR_RES)
        ir = _resize(_imread_ir16(self.ir_files[index]), IR_RES)
        label = _resize(np.load(self.label_files[index]), IR_RES, nearest=True)

        rgb = rgb[:, 148:852]
        ir = ir[:, 148:852]
        label = label[:, 148:852]

        # raw sensor dtypes; radiometric clamp + normalization run on device
        # (ops.pallas_preproc fused kernels) — 4x/2x less H2D traffic than
        # shipping host-normalized float32
        ir_vis = (np.clip(ir.astype(np.float32), 21800, 25000) - 21800) / 3200.0
        return {
            "rgb": rgb.astype(np.uint8)[None],
            "rgb_org": rgb.astype(np.uint8)[None],
            "ir": ir.astype(np.uint16)[None, ..., None],
            "ir_org": ir_vis[None, ..., None],
            "label": label.astype(np.int32)[None],
        }


class FreiburgInferDataset:
    """Label-free, timestamp-sorted full frames (ThermalDataLoaderInfer)."""

    def __init__(self, db_path: str):
        self.ir_files = sorted(glob(os.path.join(db_path, "fl_ir_aligned/*.png")),
                               key=stamp_sort_key)

    def __len__(self):
        return len(self.ir_files)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        ir_file = self.ir_files[index]
        rgb_file = ir_file.replace("fl_ir_aligned", "fl_rgb")
        # the reference crops [150:850] → width 700, which breaks the
        # decoder's skip concat at stride 8 (latent defect — its eval
        # loaders use 148:852 → 704); use the stride-aligned 704 window
        rgb = _resize(_imread_rgb(rgb_file), IR_RES)[:, 148:852]
        ir = _resize(_imread_ir16(ir_file), IR_RES)[:, 148:852]
        ir_vis = (np.clip(ir.astype(np.float32), 21800, 25000) - 21800) / 3200.0
        return {
            "rgb": rgb.astype(np.uint8)[None],
            "rgb_org": rgb.astype(np.uint8)[None],
            "ir": ir.astype(np.uint16)[None, ..., None],
            "ir_org": ir_vis[None, ..., None],
        }


class MFNetDataset:
    """MFNet eval split (MFDataset, :224-288): 4-ch PNG, 640x480."""

    WIDTH, HEIGHT = 640, 480
    _SPLIT_FILES = {"day": "test_day.txt", "night": "test_night.txt",
                    "combined": "test.txt"}

    def __init__(self, data_dir: str, split: str = "day"):
        if split not in self._SPLIT_FILES:
            raise ValueError(f"Unknown split {split}")
        with open(os.path.join(data_dir, self._SPLIT_FILES[split])) as f:
            self.names = [n.strip() for n in f.readlines()]
        self.data_dir = data_dir

    def __len__(self):
        return len(self.names)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        name = self.names[index]
        im = cv2.imread(os.path.join(self.data_dir, "images", name + ".png"),
                        cv2.IMREAD_UNCHANGED)
        rgb = cv2.cvtColor(im[:, :, :3], cv2.COLOR_BGR2RGB)
        ir = im[:, :, 3:]
        label = cv2.imread(os.path.join(self.data_dir, "labels", name + ".png"),
                           cv2.IMREAD_GRAYSCALE)
        wh = (self.WIDTH, self.HEIGHT)
        rgb = _resize(rgb, wh).astype(np.float32) / 255.0
        ir = _resize(ir, wh).astype(np.float32) / 255.0
        if ir.ndim == 2:
            ir = ir[..., None]
        label = _resize(label, wh, nearest=True)
        return {
            "rgb": ((rgb - 0.5) / 0.5)[None],
            "rgb_org": rgb[None],
            "ir": ((ir - 0.5) / 0.5)[None],
            "ir_org": ir[None],
            "label": label.astype(np.int32)[None],
        }


class MFNetTrainDataset:
    """MFNet train split (MFDatasetTrain, :291-440): day items + random night,
    decode + resize only (augmentation runs on device)."""

    WIDTH, HEIGHT = 640, 480

    def __init__(self, data_dir: str, seed: int = 0):
        with open(os.path.join(data_dir, "train.txt")) as f:
            names = [n.strip() for n in f.readlines()]
        self.day_names = [n for n in names if "flip" not in n and n.endswith("D")]
        self.night_names = [n for n in names if "flip" not in n and n.endswith("N")]
        self.data_dir = data_dir
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.day_names)

    def _read(self, name):
        im = cv2.imread(os.path.join(self.data_dir, "images", name + ".png"),
                        cv2.IMREAD_UNCHANGED)
        rgb = cv2.cvtColor(im[:, :, :3], cv2.COLOR_BGR2RGB)
        ir = im[:, :, 3:]
        wh = (self.WIDTH, self.HEIGHT)
        return _resize(rgb, wh), _resize(ir, wh)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        day_name = self.day_names[index]
        night_name = self.night_names[self._rng.randint(len(self.night_names))]
        rgb_day, ir_day = self._read(day_name)
        rgb_night, ir_night = self._read(night_name)
        label = cv2.imread(os.path.join(self.data_dir, "labels_from_rgbteacher",
                                        day_name + ".png"), cv2.IMREAD_GRAYSCALE)
        label = _resize(label, (self.WIDTH, self.HEIGHT), nearest=True)
        if ir_day.ndim == 2:
            ir_day, ir_night = ir_day[..., None], ir_night[..., None]
        return {
            "rgb_day": rgb_day.astype(np.uint8),
            "ir_day": ir_day.astype(np.uint8),
            "label_day": label.astype(np.uint8),
            "rgb_night": rgb_night.astype(np.uint8),
            "ir_night": ir_night.astype(np.uint8),
        }


class MFHarnessTrainDataset:
    """MFNet *harness* train loader — ``MF_dataset(have_label=True)`` parity
    (``mfnet/util/MF_dataset.py:10-60``): train.txt names, 4-channel PNG +
    NATIVE 9-class labels (not the HeatNet pseudo-labels of
    :class:`MFNetTrainDataset`), a transform list applied per item, resize
    back to (640, 480), image scaled by /255 (no mean/std — :42-43).
    """

    WIDTH, HEIGHT = 640, 480

    def __init__(self, data_dir: str, split: str = "train", transform=()):
        with open(os.path.join(data_dir, split + ".txt")) as f:
            self.names = [n.strip() for n in f.readlines()]
        self.data_dir = data_dir
        self.transform = list(transform)

    def __len__(self):
        return len(self.names)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        name = self.names[index]
        im = cv2.imread(os.path.join(self.data_dir, "images", name + ".png"),
                        cv2.IMREAD_UNCHANGED)
        # reference reads via PIL → RGB(+IR) channel order
        image = np.concatenate(
            [cv2.cvtColor(im[:, :, :3], cv2.COLOR_BGR2RGB), im[:, :, 3:]],
            axis=-1)
        label = cv2.imread(os.path.join(self.data_dir, "labels", name + ".png"),
                           cv2.IMREAD_GRAYSCALE)
        for func in self.transform:
            image, label = func(image, label)
        wh = (self.WIDTH, self.HEIGHT)
        image = _resize(np.ascontiguousarray(image), wh)
        label = _resize(np.ascontiguousarray(label), wh, nearest=True)
        return {
            "image": image.astype(np.float32) / 255.0,
            "label": label.astype(np.int32),
        }


class BDDValDataset:
    """BDD night validation (BDDValDataset, :445-498): 704x320 RGB only."""

    WIDTH, HEIGHT = 704, 320

    def __init__(self, db_path: str, split: str = "val"):
        if split != "val":
            raise NotImplementedError
        with open(os.path.join(db_path, "bdd_night.txt")) as f:
            self.names = [n.strip() for n in f.readlines()]
        assert self.names
        self.data_dir = db_path
        self.split = split

    def __len__(self):
        return len(self.names)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        name = self.names[index]
        rgb = _imread_rgb(os.path.join(self.data_dir, "images", self.split,
                                       name + ".jpg"))
        label = cv2.imread(os.path.join(self.data_dir, "labels", self.split,
                                        name + "_train_id.png"),
                           cv2.IMREAD_GRAYSCALE)
        wh = (self.WIDTH, self.HEIGHT)
        rgb = _resize(rgb, wh).astype(np.float32) / 255.0
        label = _resize(label, wh, nearest=True)
        return {
            "rgb": ((rgb - 0.5) / 0.5)[None],
            "rgb_org": rgb[None],
            "label": label.astype(np.int32)[None],
        }


# ---------------------------------------------------------------------------
# Batching + prefetch + device augmentation
# ---------------------------------------------------------------------------


def prefetch_items(dataset, workers: int = 8, depth: int = 32
                   ) -> Iterator[Dict[str, np.ndarray]]:
    """Yield ``dataset[0..len)`` in order, decoding up to ``depth`` items
    ahead on a ``workers``-thread pool.

    The serving-path analog of ``batch_iterator``'s prefetch: PNG decode
    (cv2 releases the GIL) overlaps device compute so a batched directory
    pass isn't serialized on the host decoder. Bounded at ``depth``
    in-flight items (a plain ``ThreadPoolExecutor.map`` would submit — and
    eventually buffer — the whole directory).
    """
    from concurrent.futures import ThreadPoolExecutor
    from collections import deque

    n = len(dataset)
    with ThreadPoolExecutor(max_workers=workers) as ex:
        pending: deque = deque()
        nxt = 0
        while nxt < min(depth, n):
            pending.append(ex.submit(dataset.__getitem__, nxt))
            nxt += 1
        while pending:
            item = pending.popleft().result()
            if nxt < n:
                pending.append(ex.submit(dataset.__getitem__, nxt))
                nxt += 1
            yield item


def batch_iterator(dataset, batch_size: int, shuffle: bool = True,
                   seed: int = 0, drop_last: bool = True,
                   prefetch: int = 2) -> Iterator[Dict[str, np.ndarray]]:
    """Stacked-numpy batch iterator with a background prefetch thread.

    Replaces ``torch.utils.data.DataLoader(num_workers, pin_memory)``
    (scripts/main.py:172-184): decode happens in a worker thread (cv2 releases
    the GIL) while the accelerator consumes the previous batch.
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)

    n_full = len(order) // batch_size
    tail = len(order) % batch_size
    n_batches = n_full + (0 if drop_last or tail == 0 else 1)

    stop = threading.Event()

    def produce(q: queue.Queue):
        try:
            for b in range(n_batches):
                idx = order[b * batch_size:(b + 1) * batch_size]
                items = [dataset[int(i)] for i in idx]
                batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
                # bounded put that notices consumer abandonment: a consumer
                # that breaks mid-epoch would otherwise leave this thread
                # parked in q.put forever, pinning the dataset and two
                # decoded batches per abandoned epoch
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        finally:
            while True:
                try:
                    q.put(None, timeout=0.2)
                    break
                except queue.Full:
                    if stop.is_set():
                        break

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    t = threading.Thread(target=produce, args=(q,), daemon=True)
    t.start()
    try:
        while True:
            batch = q.get()
            if batch is None:
                return
            yield batch
    finally:
        stop.set()


class DeviceAugment:
    """Batched, jitted train augmentation chain (ops.preprocess) on device.

    vmaps ``train_sample_preprocess`` over the batch with per-sample PRNG
    keys — the TPU-side replacement for the reference's per-item CPU worker
    augmentation (thermal_loader.py:596-740).
    """

    def __init__(self, crop_hw: Tuple[int, int] = (320, 640),
                 mfnet: bool = False):
        import jax
        from ..ops.preprocess import (mf_train_sample_preprocess,
                                      train_sample_preprocess)

        chain = mf_train_sample_preprocess if mfnet else train_sample_preprocess

        def one(key, rgb_day, ir_day, label_day, rgb_night, ir_night):
            return chain(key, rgb_day, ir_day, label_day,
                         rgb_night, ir_night, crop_hw=crop_hw)

        self._fn = jax.jit(jax.vmap(one))
        self._mfnet = mfnet

    def __call__(self, key, raw_batch: Dict[str, np.ndarray]):
        import jax

        n = raw_batch["rgb_day"].shape[0]
        keys = jax.random.split(key, n)
        ir_day = raw_batch["ir_day"].squeeze(-1) if raw_batch["ir_day"].ndim == 4 \
            else raw_batch["ir_day"]
        ir_night = raw_batch["ir_night"].squeeze(-1) if raw_batch["ir_night"].ndim == 4 \
            else raw_batch["ir_night"]
        out = self._fn(keys, raw_batch["rgb_day"], ir_day,
                       raw_batch["label_day"], raw_batch["rgb_night"], ir_night)
        out = dict(out)
        out["ir_day"] = out["ir_day"][..., None]
        out["ir_night"] = out["ir_night"][..., None]
        out["label_day"] = out["label_day"].astype(np.int32)
        return out


# ---------------------------------------------------------------------------
# Vistas pretraining loader
# ---------------------------------------------------------------------------


def resize_and_pad(img: np.ndarray, size: Tuple[int, int], pad_color=11,
                   nearest: bool = False) -> np.ndarray:
    """Aspect-preserving resize with vertical padding (vistas_dataset.py:13-36).

    The reference only handles the horizontal-image branch; same here.
    """
    h, w = img.shape[:2]
    sh, sw = size
    aspect = w / h
    new_w = sw
    new_h = int(np.round(new_w / aspect))
    pad_vert = (sh - new_h) / 2
    pad_top, pad_bot = int(np.floor(pad_vert)), int(np.ceil(pad_vert))
    if img.ndim == 3 and not isinstance(pad_color, (list, tuple, np.ndarray)):
        pad_color = [pad_color] * 3
    scaled = _resize(img, (new_w, new_h), nearest=nearest)
    return cv2.copyMakeBorder(scaled, pad_top, pad_bot, 0, 0,
                              borderType=cv2.BORDER_CONSTANT, value=pad_color)


def apply_clahe(image_bgr: np.ndarray, clip_limit: float = 2.0,
                grid: int = 8) -> np.ndarray:
    """CLAHE on the LAB L-plane, returning RGB.

    Reference ``vistas_dataset.py:95-104`` / ``thermal_loader.py:12-20``:
    clipLimit 2.0, 8x8 tiles; the LAB→RGB conversion doubles as the
    BGR→RGB swap the non-CLAHE branch does explicitly.
    """
    clahe = cv2.createCLAHE(clipLimit=clip_limit, tileGridSize=(grid, grid))
    lab = cv2.cvtColor(image_bgr, cv2.COLOR_BGR2LAB)
    planes = list(cv2.split(lab))
    planes[0] = clahe.apply(planes[0])
    return cv2.cvtColor(cv2.merge(planes), cv2.COLOR_LAB2RGB)


class ThermalDriveDataset:
    """Raw-dump drive loader (``data/thermal_loader.py:46-152``).

    Walks ``db_path`` for ``{fl,fr}_{rgb,ir}_drive_*.txt`` path lists; each
    line is a burst of space-separated frame paths. Items are dicts of
    lists: ``rgb_fl``/``rgb_fr`` (HWC float RGB in [0,1]), ``ir_fl``/
    ``ir_fr`` (HW1 float raw counts), ``paths_left``, ``org_left`` (BGR
    uint8, as the reference keeps it). Options mirror the reference:
    ``contrast_enhancement`` (CLAHE), ``load_aligned_ir`` (remap fl_ir →
    fl_ir_aligned paths), ``load_right``.
    """

    def __init__(self, db_path: str, contrast_enhancement: bool = False,
                 load_aligned_ir: bool = False, load_right: bool = True):
        self.contrast_enhancement = contrast_enhancement
        self.load_aligned_ir = load_aligned_ir
        self.load_right = load_right

        def find(pattern):
            out = []
            for root, _dirs, files in os.walk(db_path):
                out.extend(os.path.join(root, f) for f in files
                           if fnmatch.fnmatch(f, pattern))
            return sorted(out)

        lists = [find(f"{side}_{mod}_drive_*.txt")
                 for side, mod in (("fl", "rgb"), ("fr", "rgb"),
                                   ("fl", "ir"), ("fr", "ir"))]
        assert len({len(l) for l in lists}) == 1, \
            "mismatched drive list counts"

        def read_lines(path):
            with open(path) as f:
                return [x.strip() for x in f.readlines()]

        self.items = []
        for files in zip(*lists):
            for lines in zip(*(read_lines(f) for f in files)):
                self.items.append([line.split(" ") for line in lines])

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        paths = [list(p) for p in self.items[index]]
        rgb_fl = [cv2.imread(p) for p in paths[0]]
        rgb_fr = [cv2.imread(p) for p in paths[1]] if self.load_right else None

        if self.contrast_enhancement:
            rgb_fl = [apply_clahe(im) for im in rgb_fl]
            if self.load_right:
                rgb_fr = [apply_clahe(im) for im in rgb_fr]
        org_left = rgb_fl[0]

        if self.load_aligned_ir:
            for i, p in enumerate(paths[2]):
                name = os.path.split(p)[1].replace("fl_ir", "fl_ir_aligned")
                paths[2][i] = os.path.join(
                    os.path.split(os.path.split(p)[0])[0], "fl_ir_aligned", name)

        ir_fl = [cv2.imread(p, cv2.IMREAD_ANYDEPTH) for p in paths[2]
                 if os.path.isfile(p)]
        ir_fr = [cv2.imread(p, cv2.IMREAD_ANYDEPTH) for p in paths[3]
                 if os.path.isfile(p)] if self.load_right else []

        def to_rgb_float(ims):
            out = []
            for im in ims:
                if not self.contrast_enhancement:  # CLAHE already emits RGB
                    im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
                out.append(im.astype(np.float32) / 255.0)
            return out

        return {
            "rgb_fl": to_rgb_float(rgb_fl),
            "rgb_fr": to_rgb_float(rgb_fr) if self.load_right else None,
            "ir_fl": [im.astype(np.float32)[..., None] for im in ir_fl],
            "ir_fr": [im.astype(np.float32)[..., None] for im in ir_fr],
            "paths_left": paths[0],
            "org_left": org_left,
        }


class VistasBordersDataset:
    """Borders/instances/distance-transform Vistas loader
    (``data/vistas_borders_dataset.py:38-170``).

    Input is a ``paths.txt`` where each line holds 4 space-separated paths:
    borders png (uint8 0/1), trainIds png (uint16 class*256+instance),
    image, distance-transform png. Items carry the reference's 8-tuple as a
    dict: ``borders, ids, inst, image, borders_clip, image_org, dt_borders,
    dt`` — ``dt_borders`` is the L2 distance transform of (1 - borders)
    computed at load time (:148), ``borders_clip`` = clip(borders, 0, 1).
    Augmentation: random crop to (height, width), hflip p.5, color jitter
    (0.2, 0.2, 0.2, hue 0). CLAHE defaults ON (:37).
    """

    MEAN = (0.28389175985075144, 0.32513300997108185, 0.28689552631651594)
    STD = (0.1777223070810445, 0.18099167120139084, 0.17613640748441522)

    def __init__(self, paths_file: str, width: int, height: int,
                 contrast_enhancement: bool = True, augment_data: bool = True,
                 sub_mean: bool = True, seed: int = 0):
        self.width, self.height = width, height
        self.contrast_enhancement = contrast_enhancement
        self.augment_data = augment_data
        self.sub_mean = sub_mean
        self._rng = np.random.RandomState(seed)
        with open(paths_file) as f:
            lines = [x.strip() for x in f.readlines() if x.strip()]
        self.items = [tuple(line.split(" ")[:4]) for line in lines]
        if not self.items:
            raise FileNotFoundError(f"no entries in {paths_file}")

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        borders_p, ids_p, image_p, dt_p = self.items[index]
        borders = cv2.imread(borders_p, 0)
        dt = cv2.imread(dt_p, 0)
        raw_ids = cv2.imread(ids_p, -1)
        inst = (raw_ids % 256).astype(np.uint8)
        ids = (raw_ids // 256).astype(np.uint8)
        image = cv2.imread(image_p)

        if not (image.shape[0] >= self.height and image.shape[1] >= self.width):
            borders = resize_and_pad(borders, (self.height, borders.shape[1]),
                                     pad_color=2, nearest=True)
            dt = resize_and_pad(dt, (self.height, dt.shape[1]),
                                pad_color=2, nearest=True)
            ids = resize_and_pad(ids, (self.height, ids.shape[1]),
                                 pad_color=11, nearest=True)
            inst = resize_and_pad(inst, (self.height, inst.shape[1]),
                                  pad_color=11, nearest=True)
            image = resize_and_pad(image, (self.height, image.shape[1]),
                                   pad_color=0)

        if self.contrast_enhancement:
            image = apply_clahe(image)
        else:
            image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)

        rng = self._rng
        if self.augment_data:
            i = rng.randint(0, image.shape[0] - self.height + 1)
            j = rng.randint(0, image.shape[1] - self.width + 1)
            sl = np.s_[i:i + self.height, j:j + self.width]
            image, borders, dt = image[sl], borders[sl], dt[sl]
            ids, inst = ids[sl], inst[sl]
            if rng.rand() > 0.5:
                image, borders, dt = image[:, ::-1], borders[:, ::-1], dt[:, ::-1]
                ids, inst = ids[:, ::-1], inst[:, ::-1]
            if rng.rand() > 0.4:
                img = image.astype(np.float32)
                img = img * rng.uniform(0.8, 1.2)
                mean = img.mean()
                img = (img - mean) * rng.uniform(0.8, 1.2) + mean
                gray = img.mean(axis=2, keepdims=True)
                img = (img - gray) * rng.uniform(0.8, 1.2) + gray
                image = np.clip(img, 0, 255).astype(np.uint8)
        else:
            # eval mode: enforce the requested (width, height) — native
            # Vistas frames vary in size and would otherwise reach the
            # consumer at full resolution (one XLA recompile per frame)
            image = _resize(image, (self.width, self.height))
            borders = _resize(borders, (self.width, self.height), nearest=True)
            dt = _resize(dt, (self.width, self.height), nearest=True)
            ids = _resize(ids, (self.width, self.height), nearest=True)
            inst = _resize(inst, (self.width, self.height), nearest=True)

        borders = np.ascontiguousarray(borders)
        dt_borders = cv2.distanceTransform(
            (1 - borders).astype(np.uint8), cv2.DIST_L2, 5)

        img_f = np.ascontiguousarray(image).astype(np.float32) / 255.0
        image_org = img_f.copy()
        if self.sub_mean:
            img_f = (img_f - np.array(self.MEAN, np.float32)) / np.array(
                self.STD, np.float32)

        return {
            "borders": borders.astype(np.int32),
            "ids": np.ascontiguousarray(ids).astype(np.int32),
            "inst": np.ascontiguousarray(inst).astype(np.int32),
            "image": img_f,
            "borders_clip": np.clip(borders, 0, 1).astype(np.int32),
            "image_org": image_org,
            "dt_borders": dt_borders.astype(np.float32),
            "dt": np.ascontiguousarray(dt).astype(np.float32),
        }


class VistasDataset:
    """Relabelled-Vistas segmentation loader (VistasBorderDataLoader,
    data/vistas_dataset.py:38-159).

    Yields dicts with normalized ``image`` (HWC f32) and ``label`` (HW int)
    at a fixed (height, width); train-time augmentation: scale jitter
    {0.75, 1.0, 1.25} at width 1024, pad-to-height, random crop, hflip,
    color jitter, ±20° rotation. Uses the Vistas channel statistics
    (:150-151).
    """

    MEAN = (0.28389175985075144, 0.32513300997108185, 0.28689552631651594)
    STD = (0.1777223070810445, 0.18099167120139084, 0.17613640748441522)

    def __init__(self, db_path: str, width: int, height: int,
                 augment_data: bool = True, sub_mean: bool = True,
                 background_id: int = 12, contrast_enhancement: bool = False,
                 seed: int = 0):
        self.width, self.height = width, height
        self.augment_data = augment_data
        self.sub_mean = sub_mean
        self.background_id = background_id
        self.contrast_enhancement = contrast_enhancement
        self._rng = np.random.RandomState(seed)

        label_files = sorted(glob(os.path.join(db_path, "labels/*.png")))
        self.pairs = [(l.replace("labels", "images"), l) for l in label_files
                      if os.path.isfile(l.replace("labels", "images"))]
        if not self.pairs:
            raise FileNotFoundError(f"no image/label pairs under {db_path}")

    def __len__(self):
        return len(self.pairs)

    def _color_jitter(self, img: np.ndarray) -> np.ndarray:
        """torchvision ColorJitter(brightness/contrast/saturation ±20%,
        hue ±0.1) equivalent on uint8 RGB."""
        rng = self._rng
        img = img.astype(np.float32)
        img = img * rng.uniform(0.8, 1.2)  # brightness
        mean = img.mean()
        img = (img - mean) * rng.uniform(0.8, 1.2) + mean  # contrast
        gray = img.mean(axis=2, keepdims=True)
        img = (img - gray) * rng.uniform(0.8, 1.2) + gray  # saturation
        img = np.clip(img, 0, 255).astype(np.uint8)
        hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
        shift = rng.uniform(-0.1, 0.1) * 180
        hsv[..., 0] = (hsv[..., 0].astype(np.int32) + int(shift)) % 180
        return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        rgb_file, label_file = self.pairs[index]
        image = cv2.imread(rgb_file)
        ids = cv2.imread(label_file, -1)
        ids = (ids // 256).astype(np.uint8)  # class = value/256 (:73)
        rng = self._rng

        if self.augment_data:
            scale = [0.75, 1.0, 1.25][rng.randint(3)]
            h, w = image.shape[:2]
            aspect = h / w
            new_w = int(1024 * scale)
            new_h = int(int(aspect * 1024) * scale)
            image = _resize(image, (new_w, new_h))
            ids = _resize(ids, (new_w, new_h), nearest=True)

        if not (image.shape[0] >= self.height and image.shape[1] >= self.width):
            ids = resize_and_pad(ids, (self.height, ids.shape[1]),
                                 pad_color=self.background_id, nearest=True)
            image = resize_and_pad(image, (self.height, image.shape[1]),
                                   pad_color=0)

        if self.contrast_enhancement:
            # CLAHE on LAB L-plane (vistas_dataset.py:95-104)
            image = apply_clahe(image)
        else:
            image = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)

        if not self.augment_data:
            image = _resize(image, (self.width, self.height))
            ids = _resize(ids, (self.width, self.height), nearest=True)
        else:
            i = rng.randint(0, image.shape[0] - self.height + 1)
            j = rng.randint(0, image.shape[1] - self.width + 1)
            image = image[i:i + self.height, j:j + self.width]
            ids = ids[i:i + self.height, j:j + self.width]

            if rng.rand() > 0.5:
                image, ids = image[:, ::-1], ids[:, ::-1]
            if rng.rand() > 0.4:
                image = self._color_jitter(np.ascontiguousarray(image))
            if rng.rand() > 0.5:
                angle = (rng.rand() - 0.5) * 40
                m = cv2.getRotationMatrix2D(
                    (image.shape[1] / 2, image.shape[0] / 2), angle, 1.0)
                image = cv2.warpAffine(image, m, (image.shape[1], image.shape[0]),
                                       flags=cv2.INTER_LINEAR)
                ids = cv2.warpAffine(ids, m, (ids.shape[1], ids.shape[0]),
                                     flags=cv2.INTER_NEAREST)

        img_f = np.ascontiguousarray(image).astype(np.float32) / 255.0
        image_org = img_f.copy()
        if self.sub_mean:
            img_f = (img_f - np.array(self.MEAN, np.float32)) / np.array(
                self.STD, np.float32)
        return {"image": img_f, "label": np.ascontiguousarray(ids).astype(np.int32),
                "image_org": image_org}


class KAISTCycleGANDataset:
    """KAIST day/night LWIR pairs for CycleGAN (cyclegan/datasets.py:21-69).

    A = day thermal (set00/set01), B = random night thermal (set04...),
    labels from day; 256x256 bicubic (images) / nearest (labels), grayscale,
    p=.5 shared hflip, (x-.5)/.5 normalization.
    """

    SIZE = 256

    def __init__(self, root: str, seed: int = 0):
        self.files_A, self.files_label, self.files_B = [], [], []
        for s in ("set00", "set01"):
            self.files_A += sorted(glob(os.path.join(root, "Day", s, "V*/lwir/I*.jpg")))
            self.files_label += sorted(glob(os.path.join(root, "Day", s, "V*/labels/I*.png")))
        for s in ("set04", "set05", "set09", "set10", "set11"):
            self.files_B += sorted(glob(os.path.join(root, "Night", s, "V*/lwir/I*.jpg")))
        self._rng = np.random.RandomState(seed)
        if not self.files_A or not self.files_B:
            raise FileNotFoundError(f"no KAIST day/night lwir files under {root}")

    def __len__(self):
        return max(len(self.files_A), len(self.files_B))

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        from PIL import Image

        a = Image.open(self.files_A[index % len(self.files_A)]).convert("L")
        b = Image.open(self.files_B[self._rng.randint(len(self.files_B))]).convert("L")
        lbl = Image.open(self.files_label[index % len(self.files_label)])

        a = a.resize((self.SIZE, self.SIZE), Image.BICUBIC)
        b = b.resize((self.SIZE, self.SIZE), Image.BICUBIC)
        lbl = lbl.resize((self.SIZE, self.SIZE), Image.NEAREST)

        a = np.asarray(a, np.float32) / 255.0
        b = np.asarray(b, np.float32) / 255.0
        lbl = np.asarray(lbl, np.int32)
        if lbl.ndim == 3:
            lbl = lbl[..., 0].astype(np.int32)
        if self._rng.rand() > 0.5:  # shared hflip (custom_transforms)
            a, b, lbl = a[:, ::-1], b[:, ::-1], lbl[:, ::-1]

        return {
            "A": np.ascontiguousarray((a - 0.5) / 0.5)[..., None],
            "B": np.ascontiguousarray((b - 0.5) / 0.5)[..., None],
            "label": np.ascontiguousarray(lbl),
        }
