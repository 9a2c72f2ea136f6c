"""Checkpointing with the reference's save/partial-restore semantics.

Reference behaviors reproduced:
- ``save_checkpoint(state, is_best, filename)`` → file + ``*_best`` copy
  (scripts/main.py:321-324; train_trgb_segnet_conf.py:112-116) with the
  bundle {epoch, state_dict, best_iou, optimizer, lr_scheduler}.
- ``initModelPartial`` — key-intersection update (scripts/main.py:25-37).
- ``initModelRenamed`` — prefix rewrite then intersect
  (models/confusion_maximization/utils.py:59-78), needed for teacher init
  and pretraining handoffs (e.g. ``module.trgb_segnet.`` → ``module.``).
- ``initModelFull`` — exact load (utils.py:88-90).

Storage is orbax (async-capable, sharding-aware); trees are addressed by
flattened ``/``-joined key paths so prefix rewriting works like torch's
state_dict keys.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _flatten(tree, prefix=()) -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out["/".join(prefix)] = tree
    return out


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = root
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return root


def save_checkpoint(bundle: Dict[str, Any], path: str,
                    is_best: bool = False, logger=None) -> str:
    """Save a checkpoint bundle; copy to ``*_best`` when ``is_best``.

    ``bundle`` is any pytree, conventionally
    ``{"epoch", "state_dict", "best_iou", "optimizer", "lr_scheduler"}``.
    """
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, bundle)
    if is_best:
        best = path + "_best"
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)
        if logger is not None:
            logger.save(best)
    return path


def resolve_auto_resume(resume: str, default_path: str) -> str:
    """Resolve ``--resume auto`` for preemption-safe relaunch.

    ``auto`` means "resume from this run's own checkpoint path if one
    exists, else start fresh" — the same command line then works for both
    the first launch and every restart after a TPU preemption (the
    reference has no equivalent; its ``--resume`` needs an explicit path,
    scripts/main.py:129-147). Any other value passes through unchanged.
    """
    if resume != "auto":
        return resume
    p = os.path.abspath(default_path)
    return p if os.path.exists(p) else ""


def load_checkpoint(path: str) -> Dict[str, Any]:
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def restore_full(target_tree, saved_tree):
    """Exact restore (initModelFull): trees must match."""
    flat_t = _flatten(target_tree)
    flat_s = _flatten(saved_tree)
    missing = set(flat_t) - set(flat_s)
    if missing:
        raise KeyError(f"checkpoint missing {len(missing)} keys, e.g. "
                       f"{sorted(missing)[:3]}")
    return _unflatten({k: flat_s[k] for k in flat_t})


def restore_partial(target_tree, saved_tree, verbose: bool = True,
                    require_match: bool = False):
    """Key-intersection restore (initModelPartial, scripts/main.py:25-37).

    ``require_match=True`` raises when zero keys intersect — for callers
    (e.g. the export CLI) where a silent no-op restore would ship an
    artifact with random weights.
    """
    flat_t = _flatten(target_tree)
    flat_s = _flatten(saved_tree)
    updated = {k: flat_s[k] if k in flat_s and _shape_ok(flat_s[k], v) else v
               for k, v in flat_t.items()}
    n = sum(1 for k, v in flat_t.items()
            if k in flat_s and _shape_ok(flat_s[k], v))
    if require_match and n == 0:
        raise KeyError(
            "restore_partial matched zero checkpoint keys against the "
            "target model — architecture/checkpoint mismatch? "
            f"(target e.g. {sorted(flat_t)[:2]}, "
            f"saved e.g. {sorted(flat_s)[:2]})")
    if verbose:
        print(f"Updated : {n} entries (restore_partial)")
    return _unflatten(updated)


def restore_renamed(target_tree, saved_tree, to_rename: str, rename: str,
                    verbose: bool = True):
    """Prefix-rewrite restore (initModelRenamed, utils.py:59-78).

    Rewrites ``to_rename`` → ``rename`` in every saved key, then intersects
    with the target keys. Asserts at least one key landed, like the
    reference.
    """
    flat_t = _flatten(target_tree)
    flat_s = {k.replace(to_rename, rename): v
              for k, v in _flatten(saved_tree).items()}
    hits = {k for k in flat_t if k in flat_s and _shape_ok(flat_s[k], flat_t[k])}
    if verbose:
        print(f"Loaded dict with {len(hits)} entries...")
    assert hits, "renamed restore matched zero keys"
    return _unflatten({k: flat_s[k] if k in hits else v
                       for k, v in flat_t.items()})


def _shape_ok(a, b) -> bool:
    return getattr(a, "shape", None) == getattr(b, "shape", None)


def best_iou_tracker(initial: float = 0.0):
    """Tiny helper reproducing the best-iou checkpointing decision."""
    state = {"best": initial}

    def update(miou: float) -> bool:
        is_best = miou > state["best"]
        if is_best:
            state["best"] = miou
        return is_best

    update.state = state
    return update
