"""Experiment logging facade with the wandb call surface.

The reference logs everything to Weights & Biases inline
(``scripts/main.py:100-101,271,307-316``;
``train_trgb_segnet_conf.py:137,192,560-574,611-625``): per-step scalar
losses/LR, 12 per-class IoU keys per eval, image panels and best-checkpoint
uploads. This facade keeps the exact metric/key names behind an interface that
works with or without wandb installed:

- if ``wandb`` is importable and ``HEATNET_WANDB=1``, calls pass through;
- otherwise metrics append to a local JSONL file (one dict per ``log`` call)
  so runs remain inspectable on TPU pods with no egress.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

try:  # pragma: no cover - wandb is not installed in the TPU image
    import wandb as _wandb
except ImportError:
    _wandb = None


def _wandb_enabled() -> bool:
    return _wandb is not None and os.environ.get("HEATNET_WANDB", "0") == "1"


class RunLogger:
    """wandb-shaped logger: ``init`` → ``config.update`` → ``log`` → ``save``."""

    def __init__(self, project: str, entity: Optional[str] = None,
                 log_dir: str = "runs", run_name: Optional[str] = None):
        self.project = project
        self.entity = entity
        self._step = 0
        self.config: Dict[str, Any] = {}
        self._wandb_run = None

        if _wandb_enabled():  # pragma: no cover
            self._wandb_run = _wandb.init(project=project, entity=entity, name=run_name)
            self._file = None
        else:
            os.makedirs(log_dir, exist_ok=True)
            name = run_name or f"{project}-{int(time.time())}"
            self.path = os.path.join(log_dir, f"{name}.jsonl")
            self._file = open(self.path, "a")

    def update_config(self, cfg: Any) -> None:
        """``wandb.config.update(args)`` equivalent; accepts dict or argparse.Namespace."""
        if hasattr(cfg, "__dict__") and not isinstance(cfg, dict):
            cfg = vars(cfg)
        self.config.update({k: v for k, v in dict(cfg).items()})
        if self._wandb_run is not None:  # pragma: no cover
            self._wandb_run.config.update(cfg, allow_val_change=True)
        elif self._file is not None:
            self._emit({"_type": "config", **_jsonable(self.config)})

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        if self._wandb_run is not None:  # pragma: no cover
            self._wandb_run.log(metrics, step=step)
            return
        self._step = self._step + 1 if step is None else step
        self._emit({"_step": self._step, **_jsonable(metrics)})

    def log_image(self, key: str, image, caption: str = "") -> None:
        """Image panel logging; files go next to the JSONL when wandb is off."""
        if self._wandb_run is not None:  # pragma: no cover
            self._wandb_run.log({key: _wandb.Image(image, caption=caption)})
            return
        import numpy as np
        from PIL import Image as PILImage

        img = np.asarray(image)
        if img.dtype != "uint8":
            img = (np.clip(img, 0.0, 1.0) * 255).astype("uint8")
        img_dir = os.path.splitext(self.path)[0] + "_images"
        os.makedirs(img_dir, exist_ok=True)
        fname = os.path.join(img_dir, f"{key.replace('/', '_')}_{self._step}.png")
        PILImage.fromarray(img).save(fname)
        self._emit({"_type": "image", "key": key, "file": fname, "caption": caption})

    def save(self, path: str) -> None:
        """``wandb.save`` equivalent (records the artifact path locally)."""
        if self._wandb_run is not None:  # pragma: no cover
            self._wandb_run.save(path)
        else:
            self._emit({"_type": "artifact", "path": path})

    def finish(self) -> None:
        if self._wandb_run is not None:  # pragma: no cover
            self._wandb_run.finish()
        elif self._file is not None:
            self._file.close()
            self._file = None

    def _emit(self, record: Dict[str, Any]) -> None:
        if self._file is not None:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()


def _jsonable(d: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in d.items():
        try:
            json.dumps(v)
            out[k] = v
        except (TypeError, ValueError):
            if hasattr(v, "item") and getattr(v, "size", 2) == 1:
                out[k] = v.item()
            else:
                out[k] = str(v)
    return out


class AverageMeter:
    """Running average meter (reference scripts/main.py:327-343)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
