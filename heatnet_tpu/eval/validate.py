"""Validation suites: Freiburg Thermal, MFNet, BDD; plus inference dumps.

Reference: ``/root/reference/models/confusion_maximization/validation_bdd_mf.py``
— ``validate_model`` (Freiburg 320x704, :259-379), ``validate_model_mfnet``
(480x640, preds remapped to MFNet labels, :145-257), ``validate_model_bdd``
(BDD GT remapped to HeatNet labels, :39-143), ``inference`` (png dumps,
:381-429). Per-class IoUs and the logged key names are bit-compatible.

TPU-native changes: IoU statistics accumulate on device as three (C,)
count vectors (ops.iou.iou_counts) instead of materializing
``len(loader)×H×W`` host tensors; the DataParallel batch-doubling hack
(:297-299) does not exist here.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.mappings import (
    BDD_TO_HEATNET,
    CLASS_NAMES,
    HEATNET_TO_MFNET,
    mapping_to_lut,
)
from ..ops.iou import iou_counts, ious_from_counts

# wandb key names per class (train_trgb_segnet_conf.py:611-625 /
# validation_bdd_mf.py:363-377)
_PER_CLASS_KEYS = [
    "road,parking", "ground,sidewalk", "building,", "curb", "fence",
    "pole,traffic light,traffic sign", "vegetation", "terrain", "sky",
    "person,rider", "car,truck,bus,train", "motorcycle,bicycle",
]


def _pack_inputs(batch: Dict[str, Any], modalities: str):
    ins = []
    if "rgb" in modalities:
        ins.append(batch["rgb"])
    if "ir" in modalities:
        ins.append(batch["ir"])
    if not ins:
        raise ValueError("No known modality selected")
    return ins


def _device_normalize(x: jax.Array) -> jax.Array:
    """Raw sensor dtypes → normalized floats, on device.

    Eval loaders ship uint8 RGB / uint16 radiometric IR (4x/2x less H2D
    traffic than host-normalized f32); clamp+scale+normalize happen here in
    plain jnp so XLA fuses them into the network's first conv — measured
    faster than the Pallas fused-ingest kernels, which are opaque custom
    calls XLA can't fuse through (bench.py module docstring). Float inputs
    (already host-normalized, e.g. MFNet 4-ch PNGs) pass through.
    """
    from ..ops.preprocess import ir_normalize, normalize

    if x.dtype == jnp.uint8:
        return normalize(x.astype(jnp.float32) / 255.0)
    if x.dtype == jnp.uint16:
        return normalize(ir_normalize(x), mean=(0.5,), std=(0.5,))
    return x


def _forward_factory(model, variables, modalities: str, pred_lut=None,
                     mesh=None):
    """Jitted forward → (argmax prediction, iou count triple).

    The jitted function takes ONLY the model inputs + label positionally —
    never the whole batch dict. Passing the dict would ship every leaf to
    the device (the unused ``rgb_org``/``ir_org`` vis copies are ~200 MB
    per 128-batch). The prediction returns as uint8 (classes < 256): the
    full-resolution class map is the one large device→host transfer on
    the save path, and int32 quadruples its bytes for nothing — measured
    6.2 s/batch against 0.93 s over this image's relay link, and it's
    PCIe time on a real host too.

    ``mesh``: shard eval over the mesh's data axis — params replicated
    once at factory time, each batch placed with the batch dim split over
    ``data``, and GSPMD runs the forward data-parallel with the per-class
    count reduction riding ICI. The reference evals frame-at-a-time on one
    GPU of its DataParallel group (validation_bdd_mf.py:297-302); here a
    v5e-8 evaluates with all eight chips. IoUs are bit-identical to the
    unsharded path (tests/test_validate.py::test_sharded_eval_bit_identical).
    """
    lut = None if pred_lut is None else jnp.asarray(pred_lut)
    if mesh is not None:
        from ..parallel.mesh import replicate
        variables = replicate(mesh, variables)

    @jax.jit
    def _forward(ins, label):
        ins = [_device_normalize(x) for x in ins]
        if len(ins) == 2:
            seg, _, _ = model.apply(variables, ins[0], ins[1], train=False)
        else:
            seg, _, _ = model.apply(variables, ins[0], None, train=False)
        pred = jnp.argmax(seg, axis=-1)
        if lut is not None:
            pred = lut[pred]
        counts = iou_counts(pred, label.astype(jnp.int32))
        return pred.astype(jnp.uint8), counts

    def forward(batch):
        ins = tuple(_pack_inputs(batch, modalities))
        label = jnp.asarray(batch["label"])
        if mesh is not None:
            from ..parallel.mesh import shard_batch
            ins, label = shard_batch(mesh, (ins, label))
        return _forward(ins, label)

    return forward


# Eval batch size: validators group per-item loader outputs into fixed
# batches of this size (one jit cache entry per dataset shape). Override
# per call via batch_size=, or globally via HEATNET_EVAL_BATCH.
DEFAULT_EVAL_BATCH = 16


def _eval_batch_size(batch_size: Optional[int], mesh=None) -> int:
    if batch_size is not None:
        b = max(int(batch_size), 1)
    else:
        b = max(int(os.environ.get("HEATNET_EVAL_BATCH",
                                   DEFAULT_EVAL_BATCH)), 1)
    if mesh is not None:
        # the sharded batch dim must divide the data axis; round up so the
        # padded tail rows (ignore-labelled) absorb the remainder
        from ..parallel.mesh import DATA_AXIS
        d = dict(mesh.shape).get(DATA_AXIS, 1)
        b = ((b + d - 1) // d) * d
    return b


def _batched(loader: Iterable, batch_size: int, pad_label: int = 13,
             keys=None):
    """Group per-item dicts (leading dim 1) into fixed-size batches.

    The ragged tail pads to ``batch_size`` by repeating the last frame
    with the padded rows' labels forced to ``pad_label`` — a value that
    lands in the IoU ignore class, so the accumulated per-class counts are
    bit-identical to per-item eval while every forward runs at one static
    batch shape. Padding is pure numpy: the host-only vis copies
    (``rgb_org``/``ir_org``) must never round-trip through the device.
    Replaces the reference's one-frame-at-a-time loop (and its
    DataParallel batch-doubling hack, validation_bdd_mf.py:297-299).
    Yields (batch, valid_count).

    ``keys``: when given, only these dict keys are stacked — callers that
    don't save visuals skip concatenating the ``rgb_org``/``ir_org`` copies
    (~2 s of host time per 128-batch, measured).
    """
    buf = []

    def emit(items):
        batch = {k: np.concatenate([np.asarray(it[k]) for it in items],
                                   axis=0)
                 for k in items[0] if keys is None or k in keys}
        valid = len(items)
        if valid < batch_size:
            batch = {k: np.concatenate(
                [v, np.repeat(v[-1:], batch_size - valid, axis=0)], axis=0)
                for k, v in batch.items()}
            if "label" in batch:
                batch["label"][valid:] = pad_label
        return batch, valid

    for item in loader:
        buf.append(item)
        if len(buf) == batch_size:
            yield emit(buf)
            buf = []
    if buf:
        yield emit(buf)


def _to_host(x) -> np.ndarray:
    """Device→host fetch that survives multi-process meshes.

    On a multi-host slice the jitted forward's batch-sharded outputs span
    non-addressable devices, where ``np.asarray`` raises; all-gather them
    to every process first (each host saves/accumulates the full set, same
    as the single-host path). Host arrays pass through untouched.
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def _needed_keys(modalities: str, with_label: bool = True):
    """Minimal batch keys for a no-save eval pass over ``modalities``."""
    keys = set()
    if "rgb" in modalities:
        keys.add("rgb")
    if "ir" in modalities:
        keys.add("ir")
    if with_label:
        keys.add("label")
    return keys


def _accumulate(forward, loader: Iterable, save_hook=None,
                n_classes: int = 13, batch_size: Optional[int] = None,
                pad_label: int = 13, keys=None, mesh=None):
    inter = np.zeros(n_classes, np.int64)
    pred_cnt = np.zeros(n_classes, np.int64)
    targ_cnt = np.zeros(n_classes, np.int64)
    frame = 0
    for batch, valid in _batched(loader, _eval_batch_size(batch_size, mesh),
                                 pad_label,
                                 keys=None if save_hook is not None
                                 else keys):
        pred, (bi, bp, bt) = forward(batch)
        inter += _to_host(bi).astype(np.int64)
        pred_cnt += _to_host(bp).astype(np.int64)
        targ_cnt += _to_host(bt).astype(np.int64)
        if save_hook is not None:
            pred_np = _to_host(pred)
            for j in range(valid):
                save_hook(frame + j, pred_np[j],
                          {k: np.asarray(v)[j] for k, v in batch.items()})
        frame += valid
    return ious_from_counts(inter, pred_cnt, targ_cnt)


def _save_hook(save_dir: str):
    if not save_dir:
        return None
    os.makedirs(save_dir, exist_ok=True)
    from ..utils.vis import color_code_labels, save_image, vis_depth

    def hook(i, pred, frame):
        """``pred``/``frame`` entries are single frames (no batch dim)."""
        save_image(os.path.join(save_dir, f"pred_{i}.png"),
                   color_code_labels(pred))
        if "rgb_org" in frame:
            save_image(os.path.join(save_dir, f"rgb_{i}.png"),
                       frame["rgb_org"])
        if "ir_org" in frame:
            save_image(os.path.join(save_dir, f"ir_{i}.png"),
                       vis_depth(frame["ir_org"]))
        if "label" in frame:
            save_image(os.path.join(save_dir, f"gt_{i}.png"),
                       color_code_labels(frame["label"]))

    return hook


def validate_model(model, variables, loader, modalities: str,
                   mode: str = "day", logger=None, save_dir: str = "",
                   batch_size: Optional[int] = None,
                   mesh=None) -> np.ndarray:
    """Freiburg Thermal validation (validation_bdd_mf.py:259-379).

    Returns the 12-entry per-class IoU vector (classes 12/13 skipped).
    Pass ``mesh`` to shard eval over all devices (see _forward_factory).
    """
    forward = _forward_factory(model, variables, modalities, mesh=mesh)
    ious = _accumulate(forward, loader, _save_hook(save_dir),
                       batch_size=batch_size,
                       keys=_needed_keys(modalities), mesh=mesh)
    if logger is not None:
        logs = {f"{mode}_Test mean IoU": float(np.nanmean(ious))}
        for k, name in enumerate(_PER_CLASS_KEYS):
            logs[f"{mode}_Test IoU {name}"] = float(ious[k])
        logger.log(logs)
    return ious


def validate_model_mfnet(model, variables, loader, modalities: str,
                         mode: str = "day", logger=None,
                         save_dir: str = "",
                         batch_size: Optional[int] = None,
                         mesh=None) -> np.ndarray:
    """MFNet validation: HeatNet preds → MFNet label space, then IoU
    (validation_bdd_mf.py:145-257; unmapped predictions become class 0)."""
    lut = mapping_to_lut(HEATNET_TO_MFNET, num_src=14, default=0)
    forward = _forward_factory(model, variables, modalities, pred_lut=lut,
                               mesh=mesh)
    ious = _accumulate(forward, loader, _save_hook(save_dir),
                       batch_size=batch_size,
                       keys=_needed_keys(modalities), mesh=mesh)
    if logger is not None:
        logger.log({
            f"{mode}_MFNET_Test mean IoU": float(np.nanmean(ious)),
            f"{mode}_MFNET_Test IoU curb": float(ious[4]),
            f"{mode}_MFNET_Test IoU person,rider": float(ious[2]),
            f"{mode}_MFNET_Test IoU car,truck,bus,train": float(ious[1]),
            f"{mode}_MFNET_Test IoU bicycle": float(ious[3]),
        })
    return ious


def validate_model_bdd(model, variables, loader, logger=None,
                       save_dir: str = "",
                       batch_size: Optional[int] = None,
                       mesh=None) -> np.ndarray:
    """BDD night validation: BDD GT ids → HeatNet labels, RGB-only model
    input (validation_bdd_mf.py:39-143)."""
    gt_lut = mapping_to_lut(BDD_TO_HEATNET, num_src=256, default=13)

    base = _forward_factory(model, variables, "rgb", mesh=mesh)

    def forward(batch):
        batch = dict(batch)
        batch["label"] = gt_lut[np.asarray(batch["label"]).astype(np.int64)]
        return base(batch)

    # padded rows carry raw-BDD label 255, which the LUT maps to the
    # ignore class (BDD id 13 is a REAL class, so the default pad of 13
    # would corrupt the padded rows after remapping)
    ious = _accumulate(forward, loader, _save_hook(save_dir),
                       batch_size=batch_size, pad_label=255,
                       keys=_needed_keys("rgb"), mesh=mesh)
    if logger is not None:
        logs = {"BDD_Test mean IoU": float(np.nanmean(ious))}
        for k, name in enumerate(_PER_CLASS_KEYS):
            logs[f"BDD_Test IoU {name}"] = float(ious[k])
        logger.log(logs)
    return ious


def inference(model, variables, loader, modalities: str,
              save_dir: str = "",
              batch_size: Optional[int] = None, mesh=None) -> int:
    """Label-free inference with png dumps (validation_bdd_mf.py:381-429)."""
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    from ..utils.vis import color_code_labels, save_image

    if mesh is not None:
        from ..parallel.mesh import replicate
        variables = replicate(mesh, variables)

    @jax.jit
    def _forward(ins):
        ins = [_device_normalize(x) for x in ins]
        seg, _, _ = model.apply(variables, ins[0],
                                ins[1] if len(ins) == 2 else None, train=False)
        # uint8 class map: 4x fewer device->host bytes (see _forward_factory)
        return jnp.argmax(seg, axis=-1).astype(jnp.uint8)

    def forward(batch):
        ins = tuple(_pack_inputs(batch, modalities))
        if mesh is not None:
            from ..parallel.mesh import shard_batch
            ins = shard_batch(mesh, ins)
        return _forward(ins)

    keys = _needed_keys(modalities, with_label=False)
    if save_dir:
        keys.add("rgb_org")
    n = 0
    for batch, valid in _batched(loader, _eval_batch_size(batch_size, mesh),
                                 keys=keys):
        pred = _to_host(forward(batch))
        if save_dir:
            for j in range(valid):
                save_image(os.path.join(save_dir, f"pred_{n + j}.png"),
                           color_code_labels(pred[j]))
                if "rgb_org" in batch:
                    save_image(os.path.join(save_dir, f"rgb_{n + j}.png"),
                               np.asarray(batch["rgb_org"])[j])
        n += valid
    return n
