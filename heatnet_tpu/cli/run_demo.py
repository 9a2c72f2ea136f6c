"""MFNet-harness demo: predict every png in a directory, save ``*_pred.png``.

Reference: ``models/external_models/mfnet/run_demo.py:1-64`` — loads
``final``/``tmp`` weights for ``--model_name``, forwards all 4-channel pngs
in ``image/``, colorizes with the MFNet palette (util/util.py:30-54:
class 0 stays black, ids painted up to the max predicted id).
"""

from __future__ import annotations

import argparse
import os


# util/util.py:30-41 — the MFNet 9-class palette
MFNET_PALETTE = [
    [0, 0, 0],        # unlabelled
    [64, 0, 128],     # car
    [64, 64, 0],      # person
    [0, 128, 192],    # bike
    [0, 0, 192],      # curve
    [128, 128, 0],    # car_stop
    [64, 64, 128],    # guardrail
    [192, 128, 128],  # color_cone
    [192, 64, 0],     # bump
]


def visualize(names, predictions, out_suffix: str = "_pred.png"):
    """Colorize predictions next to their inputs (util/util.py:44-54)."""
    import numpy as np
    from PIL import Image

    palette = np.asarray(MFNET_PALETTE, np.uint8)
    out_paths = []
    for name, pred in zip(names, predictions):
        pred = np.asarray(pred)
        img = np.zeros((pred.shape[0], pred.shape[1], 3), np.uint8)
        for cid in range(1, int(predictions.max()) + 1):
            img[pred == cid] = palette[cid % len(palette)]
        out = name.replace(".png", out_suffix)
        Image.fromarray(img).save(out)
        out_paths.append(out)
    return out_paths


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Run MFNet-harness demo")
    p.add_argument("--model_name", "-M", default="MFNet",
                   choices=["MFNet", "RTFNet", "SegNet"])
    p.add_argument("--image_dir", default="image",
                   help="directory of 4-channel pngs (RGB+IR)")
    p.add_argument("--model_dir", default="weights",
                   help="holds <model_name>/{final,tmp} checkpoints")
    p.add_argument("--gpu", "-G", type=int, default=0, help="parity no-op")
    return p


def main(argv=None) -> list:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from ..core.cache import enable_compilation_cache
    from ..io.checkpoint import load_checkpoint, restore_full
    from ..models import MFNet, RTFNet
    from ..models.segnet_baseline import SegNetBaseline
    from ..train.state import init_model

    enable_compilation_cache()
    n_class = 9
    model = {"MFNet": lambda: MFNet(n_class=n_class),
             "RTFNet": lambda: RTFNet(n_class=n_class),
             "SegNet": lambda: SegNetBaseline(n_class=n_class)}[
        args.model_name]()

    files = sorted(f for f in os.listdir(args.image_dir)
                   if f.endswith(".png") and not f.endswith("_pred.png"))
    if not files:
        raise FileNotFoundError(f"no pngs under {args.image_dir}")
    paths = [os.path.join(args.image_dir, f) for f in files]
    images = np.asarray([np.asarray(Image.open(p)) for p in paths],
                        np.float32) / 255.0  # NHWC, 4 channels

    params, batch_stats = init_model(model, jax.random.PRNGKey(0),
                                     jnp.zeros_like(jnp.asarray(images)),
                                     init_kwargs={"train": True})

    model_dir = os.path.join(args.model_dir, args.model_name)
    ckpt = None
    for name in ("final", "tmp"):
        cand = os.path.join(model_dir, name)
        if os.path.exists(cand):
            ckpt = cand
            break
    if ckpt is None:
        raise FileNotFoundError(f"model file does not exist in {model_dir}")
    saved = load_checkpoint(ckpt)
    sd = saved.get("state_dict", saved)
    params = restore_full(params, sd["params"])
    if batch_stats is not None and "batch_stats" in sd:
        batch_stats = sd["batch_stats"]
    print("| model loaded!")

    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    @jax.jit
    def forward(x):
        seg = model.apply(variables, x, train=False)
        return jnp.argmax(seg, axis=-1)

    preds = np.asarray(forward(jnp.asarray(images)))
    out = visualize(paths, preds)
    print(f"| prediction files have been saved in {args.image_dir}/")
    return out


if __name__ == "__main__":
    main()
