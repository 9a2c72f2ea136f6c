"""Multi-run evaluator — ``eval_hotnet.py`` surface.

Reference (:26-125): re-evaluates a list of named past runs, loading each
run's config + best checkpoint and running the Freiburg night/day validators.
The reference replays wandb ``config.yaml`` files; here each run is a
directory containing ``config.json`` (the logged CLI config) and a
``checkpoint_best`` orbax directory.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument('--runs', nargs='+', required=True,
                   help='run directories (config.json + checkpoint_best)')
    p.add_argument('--testroot_day', type=str, required=True)
    p.add_argument('--testroot_night', type=str, required=True)
    p.add_argument('--testroot_fence', type=str, default='')
    p.add_argument('--log_dir', type=str, default='runs')
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..core.cache import enable_compilation_cache
    from ..data.loaders import FreiburgThermalTestDataset, get_test_paths
    from ..eval.validate import validate_model
    from ..io.checkpoint import load_checkpoint
    from ..io.logging import RunLogger
    from ..models import ResNeXtSeg
    from ..models.registry import build_network
    from ..parallel.mesh import create_mesh

    enable_compilation_cache()
    # eval rides every device (see eval/validate._forward_factory)
    eval_mesh = create_mesh() if jax.device_count() > 1 else None
    logger = RunLogger("hotnet-eval", log_dir=args.log_dir)

    def iter_ds(ds):
        # threaded decode-ahead (see data.loaders.prefetch_items)
        from ..data.loaders import prefetch_items

        return prefetch_items(ds)

    night_roots = [r for r in (args.testroot_night, args.testroot_fence) if r]
    results = {}
    for run_dir in args.runs:
        with open(os.path.join(run_dir, "config.json")) as f:
            cfg = json.load(f)
        modalities = cfg.get("modalities", "ir_rgb")
        arch = cfg.get("arch", "custom")
        n_in = (3 if "rgb" in modalities else 0) + (1 if "ir" in modalities else 0)
        if arch == "custom":
            model = ResNeXtSeg(structure=tuple(cfg.get("structure", (3, 4, 6, 3))),
                               input_channels=n_in,
                               cert_branch=cfg.get("cert_branch", False),
                               late_fusion=cfg.get("late_fusion", False),
                               dtype=jnp.bfloat16)
        else:
            model = build_network("resnet50", in_channels=n_in,
                                  late_fusion=cfg.get("late_fusion", False),
                                  dtype=jnp.bfloat16)

        saved = load_checkpoint(os.path.join(run_dir, "checkpoint_best"))
        sd = saved.get("state_dict", saved)
        variables = {"params": sd["params"]["trgb_segnet"]
                     if "trgb_segnet" in sd.get("params", {}) else sd["params"]}
        bs = sd.get("batch_stats")
        if bs is not None:
            variables["batch_stats"] = bs.get("trgb_segnet", bs)

        ious_night = validate_model(
            model, variables,
            iter_ds(FreiburgThermalTestDataset(*get_test_paths(night_roots))),
            modalities, mode="night", logger=logger, mesh=eval_mesh)
        ious_day = validate_model(
            model, variables,
            iter_ds(FreiburgThermalTestDataset(*get_test_paths([args.testroot_day]))),
            modalities, mode="day", logger=logger, mesh=eval_mesh)
        combined = float(np.nanmean((ious_day + ious_night) / 2))
        name = os.path.basename(os.path.normpath(run_dir))
        results[name] = combined
        print(f"{name}: combined mIoU {combined:.4f}")
        logger.log({f"{name}_combined_mIoU": combined})

    logger.finish()
    return results


if __name__ == "__main__":
    main()
