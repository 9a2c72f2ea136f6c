"""Class-label mappings and palettes of the HeatNet label space.

The 13-class space (+12 background, +13 ignore) used everywhere in the
reference; names as logged to wandb (train_trgb_segnet_conf.py:611-625):

0 road,parking · 1 ground,sidewalk · 2 building · 3 curb · 4 fence ·
5 pole,traffic light,traffic sign · 6 vegetation · 7 terrain · 8 sky ·
9 person,rider · 10 car,truck,bus,train · 11 motorcycle,bicycle ·
12 background · 13 ignore

Sources:
- Vistas 66-class → HeatNet relabel dict —
  ``/root/reference/data/datasets/c_relabeller/mapping.py:1-50``
- HeatNet → MFNet eval mapping — ``validation_bdd_mf.py:9-14``
- BDD 19-class → HeatNet mapping — ``validation_bdd_mf.py:16-37``
- IROS'20 class-name list — ``data/datasets/print_label_names.py:5-6``
"""

from __future__ import annotations

import numpy as np

NUM_CLASSES = 13
BACKGROUND_CLASS = 12
IGNORE_CLASS = 13

CLASS_NAMES = [
    "road,parking",
    "ground,sidewalk",
    "building,",
    "curb",
    "fence",
    "pole,traffic light,traffic sign",
    "vegetation",
    "terrain",
    "sky",
    "person,rider",
    "car,truck,bus,train",
    "motorcycle,bicycle",
    "background",
    "ignore",
]

# Mapillary Vistas class id → HeatNet class (c_relabeller/mapping.py)
VISTAS_TO_HEATNET = {
    10: 0, 12: 0, 13: 0, 14: 0, 23: 0, 24: 0,
    7: 1, 8: 0, 11: 1, 15: 1,
    6: 2, 17: 2, 16: 2, 18: 2,
    2: 3, 9: 3, 5: 3,
    3: 4, 4: 4,
    44: 5, 45: 5, 46: 5, 47: 5, 48: 5, 49: 5, 50: 5,
    30: 6,
    25: 7, 26: 7, 28: 7, 29: 7, 31: 7,
    27: 8,
    0: 9, 20: 9, 21: 9, 22: 9, 19: 9,
    53: 10, 54: 10, 55: 10, 56: 10, 58: 10, 59: 10, 60: 10, 61: 10, 62: 10,
    52: 11, 57: 11,
    65: 13,
}

# HeatNet class → MFNet class, for evaluating HeatNet preds on MFNet GT
# (validation_bdd_mf.py:9-14)
HEATNET_TO_MFNET = {3: 4, 9: 2, 10: 1, 11: 3}

# BDD100K train-id → HeatNet class (validation_bdd_mf.py:16-37)
BDD_TO_HEATNET = {
    0: 0, 1: 1, 2: 2, 3: 2, 4: 4, 5: 5, 6: 5, 7: 5, 8: 6, 9: 7, 10: 8,
    11: 9, 12: 9, 13: 10, 14: 10, 15: 10, 16: 10, 17: 11, 18: 11, 255: 13,
}


def mapping_to_lut(mapping: dict, num_src: int = 256,
                   default: int = BACKGROUND_CLASS) -> np.ndarray:
    """Dense lookup table for a sparse class mapping (device gather-ready)."""
    lut = np.full(num_src, default, dtype=np.int32)
    for src, dst in mapping.items():
        if src < num_src:
            lut[src] = dst
    return lut


def remap_labels(labels: np.ndarray, mapping: dict,
                 default: int = BACKGROUND_CLASS) -> np.ndarray:
    """Vectorized label remap: the TPU-era ``relabel_vistas_image`` class path.

    The Cython kernel (c_relabeller/relabeller.pyx:4-36) loops pixels; a LUT
    gather is equivalent and vectorizes on host and device alike.
    """
    lut = mapping_to_lut(mapping, num_src=max(int(labels.max(initial=0)) + 1, 256),
                         default=default)
    return lut[labels.astype(np.int64)]


def relabel_vistas_image(img_u16: np.ndarray, mapping: dict = VISTAS_TO_HEATNET):
    """Full panoptic relabel: uint16 ``class*256 + instance`` → remapped
    ``class*256 + dense_instance_id`` (relabeller.pyx:4-36 semantics).

    Unmapped classes become ``background*256``. Instance ids are re-numbered
    densely in first-encounter scan order (column-major, like the Cython
    loop). The native C++ version lives in ``heatnet_tpu/native``.
    """
    cls = (img_u16 // 256).astype(np.int64)
    inst = (img_u16 % 256).astype(np.int64)
    mapped = cls.copy()
    keep = np.zeros_like(cls, dtype=bool)
    for src, dst in mapping.items():
        sel = cls == src
        mapped[sel] = dst
        keep |= sel

    # dense instance re-id in column-major first-seen order
    combo = (cls * 256 + inst)
    combo_t = combo.T.reshape(-1)
    keep_t = keep.T.reshape(-1)
    uniq, first_idx = np.unique(combo_t[keep_t], return_index=True)
    order = np.argsort(first_idx)
    lut = {int(uniq[k]): i for i, k in enumerate(order)}
    new_inst = np.zeros_like(combo_t)
    if lut:
        keys = np.array(list(lut.keys()))
        vals = np.array(list(lut.values()))
        dense = np.zeros(int(keys.max()) + 1, dtype=np.int64)
        dense[keys] = vals
        new_inst[keep_t] = dense[combo_t[keep_t]]
    new_inst = new_inst.reshape(combo.T.shape).T

    out = np.where(keep, mapped * 256 + new_inst, BACKGROUND_CLASS * 256)
    return out.astype(np.uint16)


# fixed semantic palette of the reference ColorCode.get_coding_1
# (models/confusion_maximization/vis_utils.py:26-41, RGB order — the
# reference flips to BGR only for cv2.imshow); classes 12/13 are black
HEATNET_PALETTE = np.array([
    [70, 70, 70],      # 0 road,parking
    [244, 35, 232],    # 1 ground,sidewalk
    [128, 64, 128],    # 2 building
    [168, 168, 168],   # 3 curb
    [0, 255, 255],     # 4 fence
    [255, 165, 0],     # 5 pole,traffic light,traffic sign
    [107, 142, 35],    # 6 vegetation
    [255, 255, 0],     # 7 terrain
    [70, 130, 180],    # 8 sky
    [220, 20, 60],     # 9 person,rider
    [0, 255, 0],       # 10 car,truck,bus,train
    [190, 153, 153],   # 11 motorcycle,bicycle
    [0, 0, 0],         # 12 background
    [0, 0, 0],         # 13 ignore
], dtype=np.uint8)


def color_palette(n: int = 256, seed: int = 0) -> np.ndarray:
    """RGB palette: the reference's fixed semantic colors for classes 0-13
    (vis_utils.py:26-41) so rendered outputs are visually comparable;
    deterministic random for any ids beyond."""
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 255, size=(n, 3)).astype(np.uint8)
    k = min(n, len(HEATNET_PALETTE))
    pal[:k] = HEATNET_PALETTE[:k]
    return pal
