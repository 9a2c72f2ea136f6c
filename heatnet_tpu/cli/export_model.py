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
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Export serving artifact")
    p.add_argument("--arch", default="resnext50")
    p.add_argument("--structure", nargs=4, type=int, default=[3, 4, 6, 3])
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
                   help=">0: fix the batch dimension instead of symbolic")
    return p


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..core.cache import enable_compilation_cache
    from ..io.checkpoint import load_checkpoint, restore_partial
    from ..io.export import export_inference, exported_info, save_exported
    from ..models import ResNeXtSeg
    from ..train.state import init_model

    enable_compilation_cache()

    n_in = ((3 if "rgb" in args.modalities else 0)
            + (1 if "ir" in args.modalities else 0))
    model = ResNeXtSeg(structure=tuple(args.structure), classes=args.classes,
                       input_channels=n_in, dtype=jnp.bfloat16)

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
        variables["params"] = restore_partial(variables["params"], sd["params"])
        if batch_stats is not None and "batch_stats" in sd:
            variables["batch_stats"] = restore_partial(
                variables["batch_stats"], sd["batch_stats"])

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
