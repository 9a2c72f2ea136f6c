"""Pure-function image preprocessing ops (device-side, jit-able, batched NHWC).

Rebuilds the ``ThermalDataLoader.__getitem__`` chain
(``/root/reference/models/confusion_maximization/thermal_loader.py:596-740``)
as composable jax ops, keyed by explicit PRNG keys instead of global
``random`` state:

resize(960x320) → window crop [150:850] → random crop 320x640 →
**radiometric IR clamp [21800, 25000] → [0,1]** → random hflip →
random rotate ±20° → normalize (mean .5 / std .5)

plus the train-loop batch augmentations of train_trgb_segnet_conf.py:
``rectDropTensor`` (:82-86), IR scale aug (:403-406), ``smartAugment``
per-class IR scaling (:101-110).

All ops take and return float32/uint arrays with static shapes; random ops
take a PRNG key. The fused single-kernel version of the inference chain lives
in ``heatnet_tpu.ops.pallas_preproc``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# Radiometric window of the FLIR unit used for Freiburg Thermal
# (thermal_loader.py:649-659)
IR_MINVAL = 21800.0
IR_MAXVAL = 25000.0

# Default normalization (thermal_loader.py:724-728)
RGB_MEAN = (0.5, 0.5, 0.5)
RGB_STD = (0.5, 0.5, 0.5)

# Vistas training statistics (thermal_loader.py:22-23, vistas_dataset.py:150-151)
VISTAS_MEAN = (0.35675976, 0.37380189, 0.3764753)
VISTAS_STD = (0.32064945, 0.32098866, 0.32325324)


def ir_normalize(ir: jax.Array, minval: float = IR_MINVAL,
                 maxval: float = IR_MAXVAL) -> jax.Array:
    """Clamp 16-bit thermal counts to the radiometric window and scale to [0,1]."""
    ir = ir.astype(jnp.float32)
    ir = jnp.clip(ir, minval, maxval)
    return (ir - minval) / (maxval - minval)


def normalize(img: jax.Array, mean: Sequence[float] = RGB_MEAN,
              std: Sequence[float] = RGB_STD) -> jax.Array:
    """Channelwise (x - mean) / std; broadcast over NHWC or HWC."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (img.astype(jnp.float32) - mean) / std


def denormalize(img: jax.Array, mean: Sequence[float] = RGB_MEAN,
                std: Sequence[float] = RGB_STD) -> jax.Array:
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return img * std + mean


def _axis_weights(size_in: int, size_out: int, nearest: bool):
    """Interpolation (index, weight) pairs for one axis, cv2 conventions.

    cv2.INTER_LINEAR: src = (dst + 0.5) * scale - 0.5, edge-clamped.
    cv2.INTER_NEAREST: src = floor(dst * scale) (no half-pixel shift).
    Static shapes → trace-time numpy constants; the resize lowers to two
    sparse-weight matmuls (MXU-friendly) instead of gathers.
    """
    import numpy as np

    scale = size_in / size_out
    if nearest:
        idx = np.minimum(np.floor(np.arange(size_out) * scale), size_in - 1)
        m = np.zeros((size_out, size_in), np.float32)
        m[np.arange(size_out), idx.astype(int)] = 1.0
        return m
    src = (np.arange(size_out) + 0.5) * scale - 0.5
    i0 = np.clip(np.floor(src), 0, size_in - 1).astype(int)
    i1 = np.minimum(i0 + 1, size_in - 1)
    frac = np.clip(src - i0, 0.0, 1.0)
    m = np.zeros((size_out, size_in), np.float32)
    np.add.at(m, (np.arange(size_out), i0), 1.0 - frac)
    np.add.at(m, (np.arange(size_out), i1), frac)
    return m


def resize(img: jax.Array, out_hw: Tuple[int, int], method: str = "bilinear") -> jax.Array:
    """Resize NHWC/HWC/HW to (H, W) with exact cv2 conventions.

    ``bilinear`` = cv2.INTER_LINEAR (half-pixel, **no antialiasing** on
    downscale — unlike ``jax.image.resize``); ``nearest`` = cv2.INTER_NEAREST
    (used for label maps).
    """
    squeeze2 = img.ndim == 2
    squeeze3 = img.ndim == 3
    if squeeze2:
        img = img[None, ..., None]
    elif squeeze3:
        img = img[None]
    n, h, w, c = img.shape
    nearest = method == "nearest"
    mh = jnp.asarray(_axis_weights(h, out_hw[0], nearest))
    mw = jnp.asarray(_axis_weights(w, out_hw[1], nearest))
    out = jnp.einsum("oh,nhwc->nowc", mh, img.astype(jnp.float32))
    out = jnp.einsum("pw,nowc->nopc", mw, out)
    if nearest and jnp.issubdtype(img.dtype, jnp.integer):
        out = jnp.round(out).astype(img.dtype)
    if squeeze2:
        out = out[0, ..., 0]
    elif squeeze3:
        out = out[0]
    return out


def window_crop(img: jax.Array, col_lo: int = 150, col_hi: int = 850) -> jax.Array:
    """Static column window (thermal_loader.py:633-638; test uses 148:852)."""
    if img.ndim == 2:
        return img[:, col_lo:col_hi]
    if img.ndim == 3:
        return img[:, col_lo:col_hi, :]
    return img[:, :, col_lo:col_hi, :]


def random_crop_params(key: jax.Array, in_hw: Tuple[int, int],
                       out_hw: Tuple[int, int]) -> Tuple[jax.Array, jax.Array]:
    """(i, j) of a uniform random crop (transforms.RandomCrop.get_params)."""
    kh, kw = jax.random.split(key)
    i = jax.random.randint(kh, (), 0, in_hw[0] - out_hw[0] + 1)
    j = jax.random.randint(kw, (), 0, in_hw[1] - out_hw[1] + 1)
    return i, j


def crop_at(img: jax.Array, i, j, out_hw: Tuple[int, int]) -> jax.Array:
    """Dynamic-position, static-size crop (jit-friendly)."""
    if img.ndim == 2:
        return jax.lax.dynamic_slice(img, (i, j), out_hw)
    if img.ndim == 3:
        return jax.lax.dynamic_slice(img, (i, j, 0), (*out_hw, img.shape[-1]))
    return jax.lax.dynamic_slice(
        img, (0, i, j, 0), (img.shape[0], *out_hw, img.shape[-1]))


def hflip(img: jax.Array) -> jax.Array:
    """Horizontal flip (W is axis -2 for HWC/NHWC, -1 for HW)."""
    axis = 1 if img.ndim == 2 else (1 if img.ndim == 3 else 2)
    return jnp.flip(img, axis=axis)


def maybe_hflip(key: jax.Array, *imgs: jax.Array):
    """Flip all images together with probability 0.5 (thermal_loader.py:685-692)."""
    do = jax.random.uniform(key) > 0.5
    out = tuple(jnp.where(do, hflip(im), im) for im in imgs)
    return out if len(out) > 1 else out[0]


def rotate(img: jax.Array, angle_deg: jax.Array, method: str = "bilinear",
           fill: float = 0.0) -> jax.Array:
    """Rotate HWC/HW image around its center (PIL ``Image.rotate`` analog).

    Inverse-mapped affine sampling; ``bilinear`` for images, ``nearest`` for
    label maps (thermal_loader.py:695-705). Out-of-bounds pixels get ``fill``.
    """
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    theta = angle_deg * jnp.pi / 180.0  # counter-clockwise, PIL convention
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) - cx
    src_y = sin * xx + cos * yy + cy
    src_x = cos * xx - sin * yy + cx

    inside = (src_y >= 0) & (src_y <= h - 1) & (src_x >= 0) & (src_x <= w - 1)

    img_f = img.astype(jnp.float32)
    if method == "nearest":
        iy = jnp.clip(jnp.round(src_y).astype(jnp.int32), 0, h - 1)
        ix = jnp.clip(jnp.round(src_x).astype(jnp.int32), 0, w - 1)
        out = img_f[iy, ix]
    else:
        y0 = jnp.clip(jnp.floor(src_y).astype(jnp.int32), 0, h - 1)
        x0 = jnp.clip(jnp.floor(src_x).astype(jnp.int32), 0, w - 1)
        y1 = jnp.clip(y0 + 1, 0, h - 1)
        x1 = jnp.clip(x0 + 1, 0, w - 1)
        wy = jnp.clip(src_y - y0, 0.0, 1.0)[..., None]
        wx = jnp.clip(src_x - x0, 0.0, 1.0)[..., None]
        out = (
            img_f[y0, x0] * (1 - wy) * (1 - wx)
            + img_f[y1, x0] * wy * (1 - wx)
            + img_f[y0, x1] * (1 - wy) * wx
            + img_f[y1, x1] * wy * wx
        )
    out = jnp.where(inside[..., None], out, fill)
    out = out.astype(img.dtype) if jnp.issubdtype(img.dtype, jnp.integer) else out
    return out[..., 0] if squeeze else out


def maybe_rotate_pair(key: jax.Array, images: Sequence[jax.Array],
                      labels: Sequence[jax.Array] = (),
                      max_angle: float = 20.0):
    """With p=0.5, rotate images (bilinear) and labels (nearest) by a shared
    uniform angle in [-max_angle, max_angle] (thermal_loader.py:695-705)."""
    k1, k2 = jax.random.split(key)
    do = jax.random.uniform(k1) > 0.5
    angle = (jax.random.uniform(k2) - 0.5) * 2.0 * max_angle
    outs_i = tuple(jnp.where(do, rotate(im, angle, "bilinear"), im) for im in images)
    outs_l = tuple(jnp.where(do, rotate(lb, angle, "nearest"), lb) for lb in labels)
    return outs_i, outs_l


# ---------------------------------------------------------------------------
# Train-loop batch augmentations (jit-able over NHWC batches)
# ---------------------------------------------------------------------------


def rect_drop(batch: jax.Array, params: jax.Array) -> jax.Array:
    """Zero a per-sample rectangle (rectDropTensor, conf trainer :82-86).

    ``params`` is (N, 4) int [i, j, h, w]; implemented as a static-shape mask
    multiply so it stays jit-compatible (SURVEY.md §7 hard parts).
    """
    n, h, w, _ = batch.shape
    p = params.astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
    i = p[:, 0][:, None, None]
    j = p[:, 1][:, None, None]
    hh = p[:, 2][:, None, None]
    ww = p[:, 3][:, None, None]
    inside = (rows >= i) & (rows < i + hh) & (cols >= j) & (cols < j + ww)
    return jnp.where(inside[..., None], 0.0, batch)


def rect_drop_params(key: jax.Array, n: int, hw: Tuple[int, int]) -> jax.Array:
    """Random rect params matching thermal_loader.py:661-666: h ∈ [100, 300),
    w ∈ [100, 500), positioned uniformly inside the (H, W) frame."""
    kh, kw, ki, kj = jax.random.split(key, 4)
    h = jax.random.uniform(kh, (n,), minval=100, maxval=300).astype(jnp.int32)
    w = jax.random.uniform(kw, (n,), minval=100, maxval=500).astype(jnp.int32)
    i = (jax.random.uniform(ki, (n,)) * (hw[0] - h)).astype(jnp.int32)
    j = (jax.random.uniform(kj, (n,)) * (hw[1] - w)).astype(jnp.int32)
    return jnp.stack([i, j, h, w], axis=1)


def ir_scale_aug(key: jax.Array, ir: jax.Array) -> jax.Array:
    """With p=0.5, scale the whole IR batch by u ~ U(0.1, 1) (:403-406)."""
    k1, k2 = jax.random.split(key)
    do = jax.random.uniform(k1) > 0.5
    scale = jax.random.uniform(k2, minval=0.1, maxval=1.0)
    return jnp.where(do, scale * ir, ir)


def smart_augment(key: jax.Array, ir: jax.Array, label: jax.Array,
                  num_classes: int = 14) -> jax.Array:
    """Per-class IR intensity scaling (smartAugment, :101-110).

    The reference draws one factor per label value present and applies it
    across the batch; drawing a factor for every class id is equivalent in
    distribution and keeps static shapes.
    """
    factors = jax.random.uniform(key, (num_classes,), minval=0.1, maxval=1.0)
    lbl = jnp.clip(label.astype(jnp.int32), 0, num_classes - 1)
    f = factors[lbl]  # (N, H, W)
    if ir.ndim == 4:
        f = f[..., None]
    return ir * f


def maybe_smart_augment(key: jax.Array, ir: jax.Array, label: jax.Array,
                        num_classes: int = 14) -> jax.Array:
    k1, k2 = jax.random.split(key)
    do = jax.random.uniform(k1) > 0.5
    return jnp.where(do, smart_augment(k2, ir, label, num_classes), ir)


# ---------------------------------------------------------------------------
# Composed pipelines
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("normalize_rgb",))
def inference_preprocess(rgb: jax.Array, ir: jax.Array,
                         normalize_rgb: bool = True):
    """Eval/inference chain: already-resized full frames → window crop →
    IR clamp → normalize (ThermalDataLoaderInfer.__getitem__, :168-218).

    ``rgb`` uint8 (N,320,960,3), ``ir`` uint16 (N,320,960,1);
    returns float32 (N,320,700,3)/(N,320,700,1) in [-1, 1].
    """
    rgb = window_crop(rgb)
    ir = window_crop(ir)
    ir = ir_normalize(ir)
    rgb = rgb.astype(jnp.float32) / 255.0
    if normalize_rgb:
        rgb = normalize(rgb)
    ir = normalize(ir, mean=(0.5,), std=(0.5,))
    return rgb, ir


def train_sample_preprocess(
    key: jax.Array,
    rgb_day, ir_day, label_day, rgb_night, ir_night,
    crop_hw: Tuple[int, int] = (320, 640),
):
    """Full per-sample train chain after decode+resize (HWC arrays).

    Mirrors ThermalDataLoader.__getitem__ (:596-740): window crop, shared
    random crop, IR clamp, independent day/night flips and rotations,
    normalization. Returns the reference's output dict (minus sun altitudes)
    plus modality-drop params.
    """
    keys = jax.random.split(key, 6)

    rgb_day, ir_day, label_day, rgb_night, ir_night = (
        window_crop(x) for x in (rgb_day, ir_day, label_day, rgb_night, ir_night))

    i, j = random_crop_params(keys[0], rgb_day.shape[:2], crop_hw)
    rgb_day = crop_at(rgb_day, i, j, crop_hw)
    ir_day = crop_at(ir_day, i, j, crop_hw)
    label_day = crop_at(label_day, i, j, crop_hw)
    rgb_night = crop_at(rgb_night, i, j, crop_hw)
    ir_night = crop_at(ir_night, i, j, crop_hw)

    ir_day = ir_normalize(ir_day)
    ir_night = ir_normalize(ir_night)
    rgb_day = rgb_day.astype(jnp.float32) / 255.0
    rgb_night = rgb_night.astype(jnp.float32) / 255.0

    mod_drop_params = rect_drop_params(keys[1], 1, crop_hw)[0]

    rgb_day, ir_day, label_day = maybe_hflip(keys[2], rgb_day, ir_day, label_day)
    rgb_night, ir_night = maybe_hflip(keys[3], rgb_night, ir_night)

    (rgb_day, ir_day), (label_day,) = maybe_rotate_pair(
        keys[4], (rgb_day, ir_day), (label_day,))
    (rgb_night, ir_night), _ = maybe_rotate_pair(keys[5], (rgb_night, ir_night))

    return {
        "rgb_day": normalize(rgb_day),
        "ir_day": normalize(ir_day, (0.5,), (0.5,)),
        "label_day": label_day,
        "rgb_night": normalize(rgb_night),
        "ir_night": normalize(ir_night, (0.5,), (0.5,)),
        "mod_drop_params": mod_drop_params,
    }


def mf_train_sample_preprocess(
    key: jax.Array,
    rgb_day, ir_day, label_day, rgb_night, ir_night,
    crop_hw: Tuple[int, int] = (384, 384),
):
    """MFNet train chain (MFDatasetTrain.__getitem__, thermal_loader.py:322-440):
    shared random crop 384x384, independent day/night hflips and ±20°
    rotations, /255 + (x-.5)/.5 normalization (8-bit IR, no radiometric clamp).
    """
    keys = jax.random.split(key, 5)

    i, j = random_crop_params(keys[0], rgb_day.shape[:2], crop_hw)
    rgb_day = crop_at(rgb_day, i, j, crop_hw).astype(jnp.float32) / 255.0
    ir_day = crop_at(ir_day, i, j, crop_hw).astype(jnp.float32) / 255.0
    label_day = crop_at(label_day, i, j, crop_hw)
    rgb_night = crop_at(rgb_night, i, j, crop_hw).astype(jnp.float32) / 255.0
    ir_night = crop_at(ir_night, i, j, crop_hw).astype(jnp.float32) / 255.0

    rgb_day, ir_day, label_day = maybe_hflip(keys[1], rgb_day, ir_day, label_day)
    rgb_night, ir_night = maybe_hflip(keys[2], rgb_night, ir_night)
    (rgb_day, ir_day), (label_day,) = maybe_rotate_pair(
        keys[3], (rgb_day, ir_day), (label_day,))
    (rgb_night, ir_night), _ = maybe_rotate_pair(keys[4], (rgb_night, ir_night))

    return {
        "rgb_day": normalize(rgb_day),
        "ir_day": normalize(ir_day, (0.5,), (0.5,)),
        "label_day": label_day,
        "rgb_night": normalize(rgb_night),
        "ir_night": normalize(ir_night, (0.5,), (0.5,)),
    }
