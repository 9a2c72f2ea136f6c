"""Export a trained model to a self-contained AOT serving artifact.

No reference analog — the reference serves by loading torch checkpoints in
Python (scripts/inference.py:91-143). This CLI lowers checkpoint + model +
preprocessing + argmax to one StableHLO artifact (io/export.py) that any
jax process can serve without heatnet_tpu installed:

    python scripts/export_model.py --resume ckpt/ --out heatnet.jaxexp
    # serving side:
    from heatnet_tpu.io.export import load_exported   # or 3 lines of jax
    infer = jax.jit(load_exported("heatnet.jaxexp"))
    classes = infer(rgb_uint8, ir_uint16)             # any batch size

``--quant int8 --calib-data <frames>`` bakes the calibrated int8 serving
path (456 vs 414 fps on v5e, models/layers.Int8Conv) into the artifact:
activation scales calibrate on the given frames at the export resolution
and serialize as constants. The serialized module still carries f32
kernels plus the trace-time rounding ops (XLA constant-folds them to int8
weights at artifact *compile* time), so the win is serving throughput,
not file size.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Export serving artifact")
    p.add_argument("--arch", default="resnext50",
                   choices=["resnext50", "resnext101", "resnext152",
                            "pspnet"],
                   help="model family to export (pspnet uses --backend)")
    p.add_argument("--backend", default="resnet50",
                   help="PSPNet extractor backend (--arch pspnet only)")
    p.add_argument("--late-fusion", action="store_true")
    p.add_argument("--structure", nargs=4, type=int, default=None,
                   help="override the ResNeXt stage depths (default: "
                        "per --arch)")
    p.add_argument("--classes", default=13, type=int)
    p.add_argument("--modalities", default="ir_rgb",
                   help="ir_rgb | rgb | ir (input surface of the artifact)")
    p.add_argument("--height", default=320, type=int)
    p.add_argument("--width", default=704, type=int)
    p.add_argument("--resume", default="", help="checkpoint dir to embed "
                   "(omitted: random init, for pipeline tests)")
    p.add_argument("--out", required=True, help="artifact path (.jaxexp)")
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    p.add_argument("--raw-inputs", action="store_true", default=True,
                   help="consume uint8 RGB / uint16 IR and normalize "
                        "in-graph (default)")
    p.add_argument("--f32-inputs", dest="raw_inputs", action="store_false",
                   help="consume pre-normalized float32 instead")
    p.add_argument("--logits", action="store_true",
                   help="emit logits instead of the argmax class map")
    p.add_argument("--fixed-batch", default=0, type=int,
                   help=">0: fix the batch dimension instead of symbolic. "
                        "Symbolic-batch artifacts pick grouped-conv "
                        "lowerings assuming batch >= 8 (the throughput "
                        "regime); when serving small batches, fix the "
                        "batch here so each layer gets its measured-best "
                        "lowering (models/layers.GroupedConvDense)")
    p.add_argument("--quant", default="none", choices=["none", "int8"],
                   help="int8: bake the quantized serving path into the "
                        "artifact (weights stored int8; requires "
                        "--calib-data for activation scales). A symbolic-"
                        "batch export bakes int8 unconditionally (the "
                        "throughput assumption); with --fixed-batch < 8 "
                        "the layers bake bf16 instead — int8 measured "
                        "slower below batch 8 (layers._int8_batch_ok)")
    p.add_argument("--calib-data", default="",
                   help="Freiburg-layout inference dir (fl_rgb/ + "
                        "fl_ir_aligned/) used to calibrate int8 "
                        "activation scales")
    return p


def main(argv=None) -> str:
    import os

    args = build_parser().parse_args(argv)
    if args.quant != "int8":
        return _main(args)
    if not args.calib_data:
        raise SystemExit("--quant int8 requires --calib-data (frames to "
                         "calibrate activation scales on)")
    prior = os.environ.get("HEATNET_QUANT")
    os.environ["HEATNET_QUANT"] = "int8"
    try:
        return _main(args)
    finally:
        if prior is None:
            del os.environ["HEATNET_QUANT"]
        else:
            os.environ["HEATNET_QUANT"] = prior


def _main(args) -> str:
    import jax
    import jax.numpy as jnp

    from ..core.cache import enable_compilation_cache
    from ..io.checkpoint import load_checkpoint, restore_partial
    from ..io.export import export_inference, exported_info, save_exported
    from ..models import ResNeXtSeg
    from ..models.registry import build_network
    from ..train.state import init_model

    enable_compilation_cache()

    n_in = ((3 if "rgb" in args.modalities else 0)
            + (1 if "ir" in args.modalities else 0))
    if args.arch == "pspnet":
        model = build_network(backend=args.backend, n_classes=args.classes,
                              in_channels=n_in, late_fusion=args.late_fusion,
                              dtype=jnp.bfloat16)
    else:
        structure = tuple(args.structure) if args.structure else {
            "resnext50": (3, 4, 6, 3),
            "resnext101": (3, 4, 23, 3),
            "resnext152": (3, 8, 36, 3),
        }[args.arch]
        model = ResNeXtSeg(structure=structure, classes=args.classes,
                           input_channels=n_in,
                           late_fusion=args.late_fusion, dtype=jnp.bfloat16)

    b = max(args.fixed_batch, 1)
    shapes, dtypes = [], []
    if "rgb" in args.modalities:
        shapes.append((b, args.height, args.width, 3))
        dtypes.append(jnp.uint8 if args.raw_inputs else jnp.float32)
    if "ir" in args.modalities:
        shapes.append((b, args.height, args.width, 1))
        dtypes.append(jnp.uint16 if args.raw_inputs else jnp.float32)

    init_args = [jnp.zeros((1, args.height, args.width, s[-1]), jnp.float32)
                 for s in shapes]
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), *init_args)
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    if args.resume:
        saved = load_checkpoint(args.resume)
        sd = saved.get("state_dict", saved)
        variables["params"] = restore_partial(variables["params"],
                                              sd["params"],
                                              require_match=True)
        if batch_stats is not None and "batch_stats" in sd:
            variables["batch_stats"] = restore_partial(
                variables["batch_stats"], sd["batch_stats"])

    if args.quant == "int8":
        # calibrate activation scales on real frames at the export
        # resolution; the resulting static scales (and the int8-rounded
        # weights) bake into the artifact as constants
        from ..data.loaders import FreiburgInferDataset
        from ..eval.validate import _device_normalize
        from ..ops.quant import calibrate_int8

        ds = FreiburgInferDataset(args.calib_data)
        if len(ds) == 0:
            raise FileNotFoundError(f"no frames under {args.calib_data}")

        def calib_batches():
            for i in range(min(len(ds), 8)):
                item = ds[i]
                batch = []
                if "rgb" in args.modalities:
                    rgb = jax.image.resize(
                        _device_normalize(jnp.asarray(item["rgb"])),
                        (1, args.height, args.width, 3), "bilinear")
                    batch.append(rgb)
                if "ir" in args.modalities:
                    ir = jax.image.resize(
                        _device_normalize(jnp.asarray(item["ir"])),
                        (1, args.height, args.width, 1), "bilinear")
                    batch.append(ir)
                yield tuple(batch)

        variables = calibrate_int8(model.apply, variables, calib_batches(),
                                   train=False)

    artifact = export_inference(
        model, variables, shapes, dtypes,
        platforms=args.platforms,
        symbolic_batch=args.fixed_batch == 0,
        normalize=args.raw_inputs,
        argmax=not args.logits)
    save_exported(args.out, artifact)
    info = exported_info(args.out)
    print(f"exported {args.out}: {info['in_avals']} -> {info['out_avals']} "
          f"platforms={info['platforms']} ({info['bytes']/1e6:.1f} MB)")
    return args.out


if __name__ == "__main__":
    main()
