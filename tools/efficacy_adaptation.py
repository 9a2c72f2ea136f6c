"""Does the adversarial confusion training actually close a domain gap?

VERDICT r4 Missing #1: every mechanic of THE core trainer
(train_trgb_segnet_conf.py:525-546 confusion loss, :361-367 phase switch)
is parity-proven in this repo, but nothing demonstrated the *effect* the
reference exists for — night segmentation improving BECAUSE the confusion
objective aligns night features with day features. No real corpus exists
in this environment, so this experiment builds a synthetic day/night
domain-shifted corpus with exactly the paper's structure (IR is the
domain-invariant modality, RGB shifts radically at night) and trains THE
core recipe twice — ``conf_weight`` off vs on — with everything else
identical: same ConfSegnet, same RMSprop phase optimizers, same seg-step
count, same seeds, same eval frames.

Corpus design (the three properties that make the ablation meaningful):

- **Day RGB is clean and fully class-discriminative** (distinct base
  colors, sigma 25 noise) — day supervision will lean on it.
- **IR is domain-INVARIANT but AMBIGUOUS**: classes share temperature
  bands in pairs (band = class//2, the same bands day and night, sigma
  160 vs 600-count band spacing). IR alone cannot separate pair members,
  so a model that learns "ignore RGB" pays a ceiling — it must keep
  using RGB *through the shift* to win fully.
- **Night RGB is systematically MISLEADING, not just dark**: the night
  color of class i is the darkened day color of class (i+1) mod 13
  (plus a blue cast). A day-only model reading night RGB sees evidence
  for the WRONG class — the worst case for naive transfer, and exactly
  the regime where feature alignment (fool-the-critics on the night
  branch) must either remap night colors onto the day clusters or push
  the encoder onto the invariant IR — both of which raise night mIoU.

Measured result: see README "Does the adaptation work?" (recorded from an
actual run of this tool; the numbers are MEASUREMENTS, per CLAUDE.md).

Run:  python tools/efficacy_adaptation.py [--json] [--steps-seg 300]
CPU:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/... --preset tiny
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NUM_CLASSES = 13

# Day palette: distinct, saturated (class identity lives in RGB by day).
_COLORS = np.array([
    [200, 60, 60], [60, 200, 60], [60, 60, 200], [200, 200, 60],
    [200, 60, 200], [60, 200, 200], [230, 140, 30], [140, 30, 230],
    [30, 230, 140], [120, 120, 120], [230, 230, 230], [30, 30, 30],
    [90, 160, 40]], np.float32)

# Night palette: the darkened day color of the NEXT class + blue cast —
# night RGB actively argues for the wrong class.
_NIGHT_COLORS = 0.35 * _COLORS[(np.arange(NUM_CLASSES) + 1) % NUM_CLASSES]
_NIGHT_COLORS[:, 2] += 25.0

# IR bands shared in PAIRS (band = class//2): invariant across domains but
# deliberately ambiguous — 7 bands across [22000, 24800].
_IR_CENTERS = (22000.0 + 400.0
               + (np.arange(NUM_CLASSES) // 2) * 400.0).astype(np.float32)


def make_scene(rng: np.random.RandomState, h: int, w: int, night: bool):
    """One (rgb uint8, ir uint16, label uint8) frame in one domain."""
    label = np.zeros((h, w), np.uint8)
    horizon = rng.randint(h // 4, 3 * h // 4)
    label[:horizon] = 10
    label[horizon:] = 9
    for _ in range(rng.randint(6, 14)):
        cls = rng.randint(0, NUM_CLASSES)
        rh, rw = rng.randint(h // 8, h // 2), rng.randint(w // 16, w // 4)
        r0, c0 = rng.randint(0, h - rh), rng.randint(0, w - rw)
        label[r0:r0 + rh, c0:c0 + rw] = cls
    palette = _NIGHT_COLORS if night else _COLORS
    rgb = palette[label] + rng.randn(h, w, 3).astype(np.float32) * 25.0
    ir = _IR_CENTERS[label] + rng.randn(h, w).astype(np.float32) * 160.0
    return (np.clip(rgb, 0, 255).astype(np.uint8),
            np.clip(ir, 21000, 26000).astype(np.uint16),
            label)


def batch_scenes(rng, n, h, w, night):
    rgbs, irs, labels = zip(*(make_scene(rng, h, w, night) for _ in range(n)))
    return np.stack(rgbs), np.stack(irs)[..., None], np.stack(labels)


def normalize_pair(rgb_u8, ir_u16):
    """Loader-side normalization (thermal_loader.py:648-659,718-728): the
    radiometric IR clamp [21800,25000] -> [0,1], then mean/std 0.5."""
    import jax.numpy as jnp

    from heatnet_tpu.ops.preprocess import ir_normalize, normalize

    rgb = normalize(jnp.asarray(rgb_u8, jnp.float32) / 255.0)
    ir = normalize(ir_normalize(jnp.asarray(ir_u16)), mean=(0.5,), std=(0.5,))
    return rgb, ir


def per_class_iou(pred, label):
    import jax.numpy as jnp

    from heatnet_tpu.ops.iou import confusion_matrix, iou_from_confusion

    conf = confusion_matrix(jnp.asarray(pred).reshape(-1),
                            jnp.asarray(label).reshape(-1), 14)
    return np.asarray(iou_from_confusion(conf, ignore_index=(13,)))[:12]


def train_arm(conf_on: bool, args, dtype_name: str):
    """Train one arm of the ablation; returns (day_miou, night_miou)."""
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.models.conf_segnet import ConfSegnet
    from heatnet_tpu.train.adversarial import (AdversarialConfig,
                                               AdversarialTrainState,
                                               PhaseMachine,
                                               make_adversarial_steps,
                                               make_phase_optimizers)
    from heatnet_tpu.train.state import init_model

    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype_name]
    h, w, b = args.height, args.width, args.batch
    structure = tuple(int(s) for s in args.structure.split(","))

    # Scaled-down reference phase schedule (same 10:1 critic:seg ratio and
    # the initial critic warm-up, :157-159); the no-conf arm runs seg-only
    # (PhaseMachine(no_conf=True)) for the SAME number of seg steps.
    cfg = AdversarialConfig(
        conf_weight=args.conf_weight if conf_on else 0.0,
        critic_weights=(1.0,) * 8,
        iter_seg_phase=args.iter_seg,
        iter_critic_phase=args.iter_critic,
        iter_initial_critic_phase=args.iter_initial_critic,
    )
    model = ConfSegnet(disc_arch="cyclegan", num_critics=args.num_critics,
                       no_conf=not conf_on, structure=structure,
                       dtype=dtype, remat=False)

    ex = [jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 1))]
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), ex, ex,
                                     init_kwargs={"train": True})
    seg_tx, critic_tx = make_phase_optimizers(args.lr)
    state = AdversarialTrainState.create(params, batch_stats, seg_tx,
                                         critic_tx)
    seg_step, critic_step = make_adversarial_steps(model, cfg)

    phase = PhaseMachine(cfg, no_conf=not conf_on)
    # identical day/night streams in both arms (same seeds)
    rng_day = np.random.RandomState(1)
    rng_night = np.random.RandomState(2)
    key = jax.random.PRNGKey(42)

    def next_batch():
        rgb_d, ir_d, label_d = batch_scenes(rng_day, b, h, w, night=False)
        rgb_n, ir_n, _ = batch_scenes(rng_night, b, h, w, night=True)
        rgb_df, ir_df = normalize_pair(rgb_d, ir_d)
        rgb_nf, ir_nf = normalize_pair(rgb_n, ir_n)
        return {"rgb_day": rgb_df, "ir_day": ir_df,
                "rgb_night": rgb_nf, "ir_night": ir_nf,
                "label_day": jnp.asarray(label_d, jnp.int32)}

    seg_done = it = 0
    t0 = time.time()
    while seg_done < args.steps_seg:
        batch = next_batch()
        p = phase.tick()
        if p == "train_seg":
            key, sub = jax.random.split(key)
            state, metrics = seg_step(state, batch, sub)
            seg_done += 1
            if seg_done % 50 == 0 or seg_done == args.steps_seg:
                print(f"  [{'conf' if conf_on else 'base'}] it {it:5d} "
                      f"seg {seg_done:4d}/{args.steps_seg} "
                      f"seg_loss {float(metrics['seg_loss']):.4f} "
                      f"conf_loss {float(metrics['conf_loss']):.4f}",
                      flush=True)
        else:
            state, metrics = critic_step(state, batch)
        it += 1
    print(f"  [{'conf' if conf_on else 'base'}] {it} iters "
          f"({seg_done} seg) in {time.time() - t0:.1f}s", flush=True)

    # --- eval: the segnet alone (validate_model evaluates
    # model.module.trgb_segnet, validation_bdd_mf.py:259-302) ---
    from heatnet_tpu.models.trgb_segnet import ResNeXtSeg

    eval_net = ResNeXtSeg(structure=structure, input_channels=4,
                          classes=13, dtype=dtype)
    eval_vars = {"params": state.params["trgb_segnet"],
                 "batch_stats": state.batch_stats["trgb_segnet"]}

    @jax.jit
    def infer(rgb, ir):
        seg, _, _ = eval_net.apply(eval_vars, rgb, ir, train=False)
        return jnp.argmax(seg, axis=-1)

    mious = {}
    for domain, night in (("day", False), ("night", True)):
        ev_rng = np.random.RandomState(1234 if night else 123)
        preds, labels = [], []
        for _ in range(args.eval_frames // b):
            rgb, ir, label = batch_scenes(ev_rng, b, h, w, night)
            rgb_f, ir_f = normalize_pair(rgb, ir)
            preds.append(np.asarray(infer(rgb_f, ir_f)))
            labels.append(label)
        iou = per_class_iou(np.concatenate(preds), np.concatenate(labels))
        mious[domain] = float(np.nanmean(iou))
        print(f"  [{'conf' if conf_on else 'base'}] {domain} per-class "
              f"{np.round(iou, 3).tolist()}", flush=True)
    return mious["day"], mious["night"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-seg", type=int, default=300,
                    help="seg-phase steps per arm (equal in both arms)")
    ap.add_argument("--iter-seg", type=int, default=25)
    ap.add_argument("--iter-critic", type=int, default=50)
    ap.add_argument("--iter-initial-critic", type=int, default=100)
    ap.add_argument("--conf-weight", type=float, default=0.1)
    ap.add_argument("--num-critics", type=int, default=2)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--eval-frames", type=int, default=32)
    ap.add_argument("--structure", default="1,1,1,1")
    ap.add_argument("--dtype", default="bf16", choices=("bf16", "f32"))
    ap.add_argument("--preset", choices=("tiny",), default=None,
                    help="tiny: CPU-runnable scale (the slow test's config)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    if args.preset == "tiny":
        args.height, args.width, args.batch = 48, 96, 4
        args.steps_seg, args.eval_frames = 120, 16
        args.iter_initial_critic, args.iter_critic, args.iter_seg = 40, 20, 20
        args.dtype = "f32"

    from heatnet_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    base_day, base_night = train_arm(False, args, args.dtype)
    conf_day, conf_night = train_arm(True, args, args.dtype)

    print(f"\n{'arm':12s} {'day mIoU':>9s} {'night mIoU':>11s}")
    print(f"{'conf off':12s} {base_day:9.4f} {base_night:11.4f}")
    print(f"{'conf on':12s} {conf_day:9.4f} {conf_night:11.4f}")
    print(f"night gain from confusion training: "
          f"{conf_night - base_night:+.4f}")
    if args.json:
        print(json.dumps({
            "base_day_miou": round(base_day, 4),
            "base_night_miou": round(base_night, 4),
            "conf_day_miou": round(conf_day, 4),
            "conf_night_miou": round(conf_night, 4),
            "night_gain": round(conf_night - base_night, 4),
        }))


if __name__ == "__main__":
    main()
