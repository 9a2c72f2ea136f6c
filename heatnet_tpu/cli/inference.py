"""Single-frame inference CLI with forward-pass timing.

Reference: ``/root/reference/scripts/inference.py:91-143`` — loads a trained
``net_*`` model, runs one frame, prints the synchronized forward time (the
reference file is broken — ``models.__dict__['net_*']`` against an empty
``models/__init__.py``; rebuilt working here). Extended to RGB+thermal
directory inference (config #1/#2 of BASELINE.json).
"""

from __future__ import annotations

import argparse
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="HeatNet-TPU inference")
    p.add_argument("--arch", "-a", default="resnext50")
    p.add_argument("--resume", default="", type=str, help="checkpoint to load")
    p.add_argument("--data", default="",
                   help="inference dir (fl_rgb/ + fl_ir_aligned/)")
    p.add_argument("--borders-data", default="", type=str,
                   help="vistas-borders paths.txt (scripts/inference.py:97 mode)")
    p.add_argument("--width", default=768, type=int,
                   help="borders mode width (scripts/inference.py:92)")
    p.add_argument("--height", default=384, type=int)
    p.add_argument("--modalities", default="ir_rgb")
    p.add_argument("--im-save-dir", default="", type=str)
    p.add_argument("--iters", default=10, type=int, help="timing iterations")
    p.add_argument("--batch", default=0, type=int,
                   help="serve the directory in fixed-size batches of this "
                        "many frames (threaded decode prefetch overlapping "
                        "device compute; ragged tail padded) and print the "
                        "end-to-end directory throughput. 0 = the "
                        "reference's frame-at-a-time loop. Pair with "
                        "--quant int8 and batch >= 8 for the fast path")
    p.add_argument("--io-threads", default=8, type=int,
                   help="decode threads for --batch mode")
    p.add_argument("--classes", default=13, type=int)
    p.add_argument("--structure", nargs=4, type=int, default=[3, 4, 6, 3])
    p.add_argument("--quant", default="none", choices=["none", "int8"],
                   help="int8: serve through the int8 MXU path (Int8Conv), "
                        "calibrating activation scales on the first frame; "
                        "checkpoints load unchanged (no reference analog — "
                        "the reference serves fp32, scripts/inference.py). "
                        "int8 is a throughput mode: below batch 8 (incl. "
                        "this CLI's frame-at-a-time loop) the layers "
                        "auto-serve bf16, which measured FASTER at batch 1 "
                        "(27.5 vs 35.4 ms/frame; layers._int8_batch_ok, "
                        "override HEATNET_INT8_MIN_BATCH)")
    return p


def _borders_main(args) -> float:
    """Vistas-borders inference: the reference scripts/inference.py:91-143
    path (768x384 frames, RGB-only Vistas segnet, color-coded dumps)."""
    import os
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core.cache import enable_compilation_cache
    from ..data.loaders import VistasBordersDataset
    from ..io.checkpoint import load_checkpoint, restore_partial
    from ..models import ResNeXtSeg
    from ..train.state import init_model
    from ..utils.vis import color_code_labels, save_image

    enable_compilation_cache()
    ds = VistasBordersDataset(args.borders_data, args.width, args.height,
                              contrast_enhancement=False, augment_data=False)
    model = ResNeXtSeg(structure=tuple(args.structure), input_channels=3,
                       classes=args.classes, input_3x3=False,
                       dtype=jnp.bfloat16)
    first = ds[0]
    img = jnp.asarray(first["image"][None])
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     jnp.zeros(img.shape, jnp.float32))
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    if args.resume:
        saved = load_checkpoint(args.resume)
        sd = saved.get("state_dict", saved)
        variables["params"] = restore_partial(variables["params"], sd["params"])

    if args.quant == "int8":
        from ..ops.quant import calibrate_int8

        variables = calibrate_int8(model.apply, variables,
                                   [(img.astype(jnp.float32),)], train=False)

    @jax.jit
    def forward(x):
        seg, _, _ = model.apply(variables, x, train=False)
        return jnp.argmax(seg, axis=-1)

    forward(img).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        pred = forward(img)
    pred.block_until_ready()
    dt = (time.perf_counter() - t0) / args.iters
    print("Network took %f seconds" % dt)

    if args.im_save_dir:
        os.makedirs(args.im_save_dir, exist_ok=True)
        for i in range(len(ds)):
            item = ds[i]
            pred = np.asarray(forward(jnp.asarray(item["image"][None])))[0]
            save_image(os.path.join(args.im_save_dir, f"pred_{i}.png"),
                       color_code_labels(pred))
            save_image(os.path.join(args.im_save_dir, f"gt_{i}.png"),
                       color_code_labels(item["ids"]))
            save_image(os.path.join(args.im_save_dir, f"rgb_{i}.png"),
                       item["image_org"])
    return dt


def main(argv=None) -> float:
    import os

    args = build_parser().parse_args(argv)
    if args.quant != "int8":
        return _main(args)
    # trace-time flag: must be set before any model.apply trace; restored
    # afterwards so in-process callers (tests) aren't left quantized
    prior = os.environ.get("HEATNET_QUANT")
    os.environ["HEATNET_QUANT"] = "int8"
    try:
        return _main(args)
    finally:
        if prior is None:
            del os.environ["HEATNET_QUANT"]
        else:
            os.environ["HEATNET_QUANT"] = prior


def _main(args) -> float:
    if args.borders_data:
        return _borders_main(args)
    if not args.data:
        raise SystemExit("one of --data / --borders-data is required")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core.cache import enable_compilation_cache
    from ..data.loaders import FreiburgInferDataset
    from ..eval.validate import inference
    from ..io.checkpoint import load_checkpoint, restore_partial
    from ..models import get_model
    from ..train.state import init_model

    enable_compilation_cache()

    n_in = (3 if "rgb" in args.modalities else 0) + (1 if "ir" in args.modalities else 0)
    model = get_model("net_" + args.arch, classes=args.classes,
                      input_channels=n_in, dtype=jnp.bfloat16)
    if tuple(args.structure) != (3, 4, 6, 3):
        from ..models import ResNeXtSeg
        model = ResNeXtSeg(structure=tuple(args.structure),
                           classes=args.classes, input_channels=n_in,
                           dtype=jnp.bfloat16)

    from ..data.packed import PackedFrameDataset, is_pack_dir

    # a heatnet-pack-v1 directory serves decode-free (data/packed.py);
    # a PNG capture tree decodes per frame — same item surface either way
    ds = (PackedFrameDataset(args.data) if is_pack_dir(args.data)
          else FreiburgInferDataset(args.data))
    if len(ds) == 0:
        raise FileNotFoundError(f"no frames under {args.data}")
    first = ds[0]

    rgb = jnp.asarray(first["rgb"])
    ir = jnp.asarray(first["ir"])
    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     jnp.zeros(rgb.shape, jnp.float32),
                                     jnp.zeros(ir.shape, jnp.float32))
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    if args.resume:
        saved = load_checkpoint(args.resume)
        sd = saved.get("state_dict", saved)
        variables["params"] = restore_partial(variables["params"], sd["params"])
        if batch_stats is not None and "batch_stats" in sd:
            variables["batch_stats"] = restore_partial(variables["batch_stats"],
                                                       sd["batch_stats"])

    from ..eval.validate import _device_normalize

    if args.quant == "int8":
        # one-shot calibration on the first frame records static
        # activation scales into the "quant" collection
        from ..ops.quant import calibrate_int8

        variables = calibrate_int8(
            model.apply, variables,
            [(_device_normalize(rgb), _device_normalize(ir))], train=False)

    @jax.jit
    def forward(rgb, ir):
        # loader ships raw uint8/uint16; normalization is fused on device
        seg, _, _ = model.apply(variables, _device_normalize(rgb),
                                _device_normalize(ir), train=False)
        return jnp.argmax(seg, axis=-1)

    forward(rgb, ir).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        pred = forward(rgb, ir)
    pred.block_until_ready()
    dt = (time.perf_counter() - t0) / args.iters
    print("Network took %f seconds" % dt)

    if args.batch > 0:
        from ..data.loaders import prefetch_items

        loader = prefetch_items(ds, workers=args.io_threads,
                                depth=max(4 * args.batch, 32))
        t0 = time.perf_counter()
        n = inference(model, variables, loader, args.modalities,
                      save_dir=args.im_save_dir, batch_size=args.batch)
        e2e = time.perf_counter() - t0
        print(f"Directory throughput: {n / e2e:.1f} frames/sec end-to-end "
              f"({n} frames, batch {args.batch}, decode+H2D+forward"
              f"{'+save' if args.im_save_dir else ''})")
    else:
        # --batch 0 keeps the reference's frame-at-a-time loop (and the
        # documented batch-1 int8→bf16 auto-fallback); batch_size=1, not
        # the validators' default of 16
        n = inference(model, variables,
                      (ds[i] for i in range(len(ds))), args.modalities,
                      save_dir=args.im_save_dir, batch_size=1)
    print(f"Ran inference on {n} frames")
    return dt


if __name__ == "__main__":
    main()
