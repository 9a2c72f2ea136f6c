"""CycleGAN test CLIs — ``cyclegan/test.py`` + ``test_ir_segmentation.py``.

Reference: generate fake-A/fake-B translations for every KAIST frame
(test.py:33-87) and run the joint seg net on night IR
(test_ir_segmentation.py:74-159), writing pngs.
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument('--dataroot', required=True)
    p.add_argument('--checkpoint_dir', required=True,
                   help='dir with netG_A2B / netG_B2A / netSeg checkpoints')
    p.add_argument('--output_dir', default='cyclegan_output')
    p.add_argument('--size', type=int, default=256)
    p.add_argument('--input_nc', type=int, default=1)
    p.add_argument('--output_nc', type=int, default=1)
    p.add_argument('--n_residual_blocks', type=int, default=9)
    p.add_argument('--seg_structure', nargs=4, type=int, default=[3, 4, 6, 3])
    p.add_argument('--n_classes', type=int, default=12)
    p.add_argument('--limit', type=int, default=None)
    p.add_argument('--run_seg', action='store_true',
                   help='also run netSeg on night IR (test_ir_segmentation)')
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..core.cache import enable_compilation_cache
    from ..data.loaders import KAISTCycleGANDataset
    from ..io.checkpoint import load_checkpoint
    from ..models import Generator, ResNeXtSeg
    from ..utils.vis import color_code_labels, save_image

    enable_compilation_cache()

    gen_a2b = Generator(output_nc=args.output_nc,
                        n_residual_blocks=args.n_residual_blocks)
    gen_b2a = Generator(output_nc=args.input_nc,
                        n_residual_blocks=args.n_residual_blocks)
    p_a2b = load_checkpoint(os.path.join(args.checkpoint_dir, "netG_A2B"))
    p_b2a = load_checkpoint(os.path.join(args.checkpoint_dir, "netG_B2A"))

    fwd_a2b = jax.jit(lambda x: gen_a2b.apply({"params": p_a2b}, x))
    fwd_b2a = jax.jit(lambda x: gen_b2a.apply({"params": p_b2a}, x))

    seg_fwd = None
    if args.run_seg:
        seg_net = ResNeXtSeg(structure=tuple(args.seg_structure),
                             input_channels=args.input_nc,
                             classes=args.n_classes)
        seg_saved = load_checkpoint(os.path.join(args.checkpoint_dir, "netSeg"))
        seg_vars = {"params": seg_saved["params"]}
        if seg_saved.get("batch_stats") is not None:
            seg_vars["batch_stats"] = seg_saved["batch_stats"]
        seg_fwd = jax.jit(lambda x: jnp.argmax(
            seg_net.apply(seg_vars, x, None)[0], axis=-1))

    ds = KAISTCycleGANDataset(args.dataroot)
    os.makedirs(os.path.join(args.output_dir, "A"), exist_ok=True)
    os.makedirs(os.path.join(args.output_dir, "B"), exist_ok=True)
    n = len(ds) if args.limit is None else min(args.limit, len(ds))
    for i in range(n):
        item = ds[i]
        real_a = jnp.asarray(item["A"])[None]
        real_b = jnp.asarray(item["B"])[None]
        fake_b = 0.5 * (np.asarray(fwd_a2b(real_a))[0] + 1.0)
        fake_a = 0.5 * (np.asarray(fwd_b2a(real_b))[0] + 1.0)
        save_image(os.path.join(args.output_dir, "B", f"{i:04d}.png"),
                   fake_b[..., 0])
        save_image(os.path.join(args.output_dir, "A", f"{i:04d}.png"),
                   fake_a[..., 0])
        if seg_fwd is not None:
            pred = np.asarray(seg_fwd(real_b))[0]
            save_image(os.path.join(args.output_dir, f"seg_{i:04d}.png"),
                       color_code_labels(pred))
        if i % 50 == 0:
            print(f"Generated images {i:04d} of {n:04d}")
    return n


if __name__ == "__main__":
    main()
