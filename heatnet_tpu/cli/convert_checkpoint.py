"""Convert a reference torch ``.pth`` checkpoint into an orbax checkpoint.

The migration entry point for a reference user's trained weights: the
reference saves ``torch.save({'state_dict': …})`` bundles
(scripts/main.py:321-324, train_trgb_segnet_conf.py:112-116) and restores
them with prefix rewrites (``initModelRenamed``, utils.py:59-78). This CLI
runs the full torch→flax conversion pipeline (io/torch_import.py: NCHW→NHWC
layouts, deconv kernel flips, BN stats split, name flattening, prefix
rewrite) against a target architecture and writes a native heatnet_tpu
checkpoint that every trainer/eval CLI's ``--resume`` accepts.

    python scripts/convert_checkpoint.py \
        --torch-checkpoint ref_best.pth.tar \
        --to-rename module.trgb_segnet. --rename "" \
        --out ckpt_converted
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="torch .pth -> orbax checkpoint")
    p.add_argument("--torch-checkpoint", required=True, help=".pth/.pth.tar")
    p.add_argument("--out", required=True, help="orbax checkpoint dir")
    p.add_argument("--arch", default="resnext", choices=["resnext", "pspnet"])
    p.add_argument("--structure", nargs=4, type=int, default=[3, 4, 6, 3])
    p.add_argument("--backend", default="resnet50",
                   help="pspnet extractor backend")
    p.add_argument("--classes", default=13, type=int)
    p.add_argument("--modalities", default="ir_rgb")
    p.add_argument("--late-fusion", action="store_true")
    p.add_argument("--cert-branch", action="store_true")
    p.add_argument("--input-3x3", action="store_true", default=True)
    p.add_argument("--vistas-stem", dest="input_3x3", action="store_false",
                   help="7x7 stem (Vistas segnet variant)")
    p.add_argument("--to-rename", default="",
                   help="prefix to rewrite (initModelRenamed), e.g. "
                        "'module.trgb_segnet.'")
    p.add_argument("--rename", default="", help="replacement prefix")
    p.add_argument("--prepend", default="",
                   help="prefix to PREPEND to every converted key — the "
                        "pretrained-backbone path: a bare torchvision "
                        "resnet state_dict lands under the extractor "
                        "submodule with --prepend feats. (reproduces the "
                        "reference's torchvision-URL init, "
                        "extractors.py:369-408, from a local .pth)")
    return p


def main(argv=None) -> str:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..io.checkpoint import save_checkpoint
    from ..io.torch_import import import_into, load_torch_checkpoint
    from ..models import ResNeXtSeg
    from ..models.registry import build_network
    from ..train.state import init_model

    n_in = ((3 if "rgb" in args.modalities else 0)
            + (1 if "ir" in args.modalities else 0))
    if args.arch == "pspnet":
        model = build_network(backend=args.backend, n_classes=args.classes,
                              late_fusion=args.late_fusion, in_channels=n_in)
    else:
        model = ResNeXtSeg(structure=tuple(args.structure),
                           classes=args.classes, input_channels=n_in,
                           late_fusion=args.late_fusion,
                           cert_branch=args.cert_branch,
                           input_3x3=args.input_3x3)

    # both families take (modal_1, modal_2): rgb+ir, or one modality alone
    init_args = []
    if "rgb" in args.modalities:
        init_args.append(jnp.zeros((1, 64, 128, 3)))
    if "ir" in args.modalities:
        init_args.append(jnp.zeros((1, 64, 128, 1)))

    params, batch_stats = init_model(model, jax.random.PRNGKey(0), *init_args)

    state_dict = load_torch_checkpoint(args.torch_checkpoint)
    params, batch_stats = import_into(
        params, batch_stats, state_dict,
        to_rename=args.to_rename, rename=args.rename,
        prepend=args.prepend)

    bundle = {"state_dict": {"params": params}}
    if batch_stats is not None:
        bundle["state_dict"]["batch_stats"] = batch_stats
    save_checkpoint(bundle, args.out)
    print(f"converted {args.torch_checkpoint} -> {args.out}")
    return args.out


if __name__ == "__main__":
    main()
