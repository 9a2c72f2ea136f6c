"""Per-class IoU delta, bf16 vs int8 serving, on TRAINED weights.

VERDICT r1 weak-#2: the published int8 argmax agreement (0.9704) was
measured on random init, which says little about trained-weight
behavior. No real checkpoint or dataset exists in this environment, so
the strongest obtainable evidence is: train the flagship model to
convergence on a LEARNABLE synthetic scene (class identity encoded in
RGB color + IR temperature bands, like the real task's day/night
thermal signatures), then measure per-class IoU bf16 vs int8 on held-out
frames — plus calibration-batch-count sensitivity.

The scene generator paints each frame with a sky/road vertical split
plus random class-colored rectangles; RGB carries a per-class base color
(+/- noise), IR a per-class temperature band inside the radiometric
window [21800, 25000] the preprocessing clamp expects. The model must
learn a genuine multi-channel mapping, so post-training activations have
trained statistics (BN running stats included), which is exactly what
int8 calibration quantizes.

Run on the real chip:
    python tools/bench_int8_quality.py [--steps 300] [--train-batch 8]

Prints per-class IoU for bf16 and for int8 at 1/4/16 calibration
batches, the mIoU deltas, and argmax agreement. Results are recorded in
README.md next to the fps claims.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUM_CLASSES = 13  # reference train classes 0..12 (12=background), 13=ignore

# per-class RGB base colors (distinct, noisy at +/-25) and IR temperature
# band centers inside the radiometric window
_COLORS = np.array([
    [200, 60, 60], [60, 200, 60], [60, 60, 200], [200, 200, 60],
    [200, 60, 200], [60, 200, 200], [230, 140, 30], [140, 30, 230],
    [30, 230, 140], [120, 120, 120], [230, 230, 230], [30, 30, 30],
    [90, 160, 40]], np.float32)
_IR_CENTERS = np.linspace(22200, 24600, NUM_CLASSES).astype(np.float32)


def make_scene(rng: np.random.RandomState, h: int, w: int):
    """One (rgb uint8, ir uint16, label uint8) frame."""
    label = np.zeros((h, w), np.uint8)
    horizon = rng.randint(h // 4, 3 * h // 4)
    label[:horizon] = 10            # "sky"
    label[horizon:] = 9             # "road"
    for _ in range(rng.randint(6, 14)):
        cls = rng.randint(0, NUM_CLASSES)
        rh, rw = rng.randint(h // 8, h // 2), rng.randint(w // 16, w // 4)
        r0, c0 = rng.randint(0, h - rh), rng.randint(0, w - rw)
        label[r0:r0 + rh, c0:c0 + rw] = cls
    rgb = _COLORS[label] + rng.randn(h, w, 3).astype(np.float32) * 25.0
    ir = _IR_CENTERS[label] + rng.randn(h, w).astype(np.float32) * 120.0
    return (np.clip(rgb, 0, 255).astype(np.uint8),
            np.clip(ir, 21000, 26000).astype(np.uint16),
            label)


def batch_scenes(rng, n, h, w):
    rgbs, irs, labels = zip(*(make_scene(rng, h, w) for _ in range(n)))
    return np.stack(rgbs), np.stack(irs)[..., None], np.stack(labels)


def normalize(rgb_u8, ir_u16):
    """The serving ingest (matches bench.py's infer): uint8/uint16 full
    frames -> window crop + normalize (ops/preprocess) -> pad 700 -> 704
    so the decoder's 2x upsamples match the skip widths."""
    import jax.numpy as jnp

    from heatnet_tpu.ops.preprocess import inference_preprocess
    rgb_f, ir_f = inference_preprocess(jnp.asarray(rgb_u8),
                                       jnp.asarray(ir_u16))
    pad = ((0, 0), (0, 0), (2, 2), (0, 0))
    return jnp.pad(rgb_f, pad), jnp.pad(ir_f, pad)


def crop_labels(label):
    """The label-side counterpart: window crop 150:850, ignore-pad to 704."""
    return np.pad(label[:, :, 150:850], ((0, 0), (0, 0), (2, 2)),
                  constant_values=13)


def per_class_iou(pred, label):
    """HeatNet calculate_ious semantics: classes 0..11, NaN where absent."""
    import jax.numpy as jnp

    from heatnet_tpu.ops.iou import confusion_matrix, iou_from_confusion
    conf = confusion_matrix(jnp.asarray(pred).reshape(-1),
                            jnp.asarray(label).reshape(-1), 14)
    return np.asarray(iou_from_confusion(conf, ignore_index=(13,)))[:12]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--train-batch", type=int, default=8)
    ap.add_argument("--eval-frames", type=int, default=32)
    ap.add_argument("--eval-batch", type=int, default=8)
    ap.add_argument("--hw", default="320x960",
                    help="raw frame size pre-crop (the real camera frame)")
    ap.add_argument("--json", action="store_true",
                    help="print ONE machine-readable JSON line (calib=1 "
                         "row only) — consumed by bench.py so the driver "
                         "artifact carries the trained-weight int8 truth "
                         "(VERDICT r2 item 6)")
    ap.add_argument("--calib", type=int, nargs="+", default=None,
                    help="calibration batch counts to sweep")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))
    mh, mw = h, (w - 260) + 4  # window crop 150:850 then pad 2+2

    import jax
    import jax.numpy as jnp
    import optax

    from heatnet_tpu.core.cache import enable_compilation_cache
    from heatnet_tpu.models import ResNeXtSeg
    from heatnet_tpu.ops.quant import calibrate_int8
    from heatnet_tpu.train.state import TrainState
    from heatnet_tpu.train.supervised import make_train_step

    enable_compilation_cache()
    rng = np.random.RandomState(0)

    model = ResNeXtSeg(structure=(3, 4, 6, 3), input_channels=4,
                       dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((args.train_batch, mh, mw, 3)),
        jnp.zeros((args.train_batch, mh, mw, 1)))
    state = TrainState.create(
        model.apply, variables["params"], variables.get("batch_stats"),
        optax.chain(optax.clip_by_global_norm(10.0), optax.adam(2e-4)))
    train_step = make_train_step(model)

    t0 = time.time()
    for step in range(args.steps):
        rgb, ir, label = batch_scenes(rng, args.train_batch, h, w)
        rgb_f, ir_f = normalize(rgb, ir)
        batch = {"image": jnp.concatenate([rgb_f, ir_f], -1),
                 "label": jnp.asarray(crop_labels(label))}
        state, metrics = train_step(state, batch)
        if step % 50 == 0 or step == args.steps - 1:
            print(f"  step {step:4d} loss {float(metrics['loss']):.4f} "
                  f"acc {float(metrics['accuracy']):.4f}", flush=True)
    print(f"trained {args.steps} steps in {time.time() - t0:.1f}s")

    trained = {"params": state.params, "batch_stats": state.batch_stats}

    # held-out eval frames
    eval_rng = np.random.RandomState(123)
    ev = [batch_scenes(eval_rng, args.eval_batch, h, w)
          for _ in range(args.eval_frames // args.eval_batch)]

    @jax.jit
    def infer_bf16(rgb_f, ir_f):
        seg, _, _ = model.apply(trained, rgb_f, ir_f)
        return jnp.argmax(seg, axis=-1)

    preds_b, labels_all = [], []
    for rgb, ir, label in ev:
        rgb_f, ir_f = normalize(rgb, ir)
        preds_b.append(np.asarray(infer_bf16(rgb_f, ir_f)))
        labels_all.append(crop_labels(label))
    preds_b = np.concatenate(preds_b)
    labels_all = np.concatenate(labels_all)
    iou_b = per_class_iou(preds_b, labels_all)
    print(f"\nbf16  per-class IoU: {np.round(iou_b, 4).tolist()}")
    print(f"bf16  mIoU {np.nanmean(iou_b):.4f}")

    # calibration batches drawn from the TRAIN distribution (standard PTQ)
    calib_rng = np.random.RandomState(7)
    calib_all = []
    for _ in range(16):
        rgb, ir, _ = batch_scenes(calib_rng, args.eval_batch, h, w)
        calib_all.append(tuple(np.asarray(v) for v in normalize(rgb, ir)))

    os.environ["HEATNET_QUANT"] = "int8"
    try:
        qmodel = ResNeXtSeg(structure=(3, 4, 6, 3), input_channels=4,
                            dtype=jnp.bfloat16)
        rows = []
        for k in (args.calib or (1, 4, 16)):
            qvars = calibrate_int8(qmodel.apply, dict(trained), calib_all[:k])

            @jax.jit
            def infer_q(rgb_f, ir_f, qvars=qvars):
                seg, _, _ = qmodel.apply(qvars, rgb_f, ir_f)
                return jnp.argmax(seg, axis=-1)

            preds_q = []
            for rgb, ir, _label in ev:
                rgb_f, ir_f = normalize(rgb, ir)
                preds_q.append(np.asarray(infer_q(rgb_f, ir_f)))
            preds_q = np.concatenate(preds_q)
            iou_q = per_class_iou(preds_q, labels_all)
            agree = float((preds_q == preds_b).mean())
            rows.append((k, iou_q, agree))
            print(f"int8 (calib {k:2d}) mIoU {np.nanmean(iou_q):.4f} "
                  f"delta {np.nanmean(iou_q) - np.nanmean(iou_b):+.4f} "
                  f"agree {agree:.4f}", flush=True)

        print(f"\n{'calib':>5s} {'mIoU':>7s} {'delta':>8s} {'agree':>7s} "
              f"{'worst-class delta':>18s}")
        for k, iou_q, agree in rows:
            d = iou_q - iou_b
            print(f"{k:5d} {np.nanmean(iou_q):7.4f} "
                  f"{np.nanmean(iou_q) - np.nanmean(iou_b):+8.4f} {agree:7.4f} "
                  f"{np.nanmin(d):+18.4f}")
        if args.json:
            import json
            k, iou_q, agree = rows[0]
            print(json.dumps({
                "bf16_trained_miou": round(float(np.nanmean(iou_b)), 4),
                "int8_trained_miou": round(float(np.nanmean(iou_q)), 4),
                "int8_trained_miou_delta": round(
                    float(np.nanmean(iou_q) - np.nanmean(iou_b)), 4),
                "int8_trained_agreement": round(agree, 4),
                "calib_batches": k,
            }))
    finally:
        del os.environ["HEATNET_QUANT"]


if __name__ == "__main__":
    main()
