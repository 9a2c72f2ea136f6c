"""Does the day→night adaptation recipe actually close a domain gap?

VERDICT r4 Missing #1: every mechanic of THE core trainer
(train_trgb_segnet_conf.py:525-546 confusion loss, :454-480 night
pseudo-label supervision, :361-367 phase switch) is parity-proven in
this repo, but nothing demonstrated the *effect* the reference exists
for — night segmentation improving because of the adaptation machinery.
No real corpus exists in this environment, so this experiment builds a
synthetic day/night domain-shifted corpus with exactly the paper's
structure (IR is the domain-invariant modality, RGB degrades radically
at night) and runs a FOUR-ARM ablation of the recipe, everything else
identical (same ConfSegnet, same RMSprop phase optimizers, same
seg-step count, same seeds, same eval frames):

    base    day supervision only (conf_weight 0, no teacher)
    conf    + adversarial confusion critics (:525-546)
    pseudo  + IR-teacher night pseudo-labels (:454-480, the
            --night_supervision_model path; teacher = IR-only segnet
            trained on day IR, transfers to night because IR is
            invariant — the paper's central premise)
    full    both — THE reference recipe.

Corpus design (the three properties that make the ablation meaningful):

- **Day RGB is clean and fully class-discriminative** (distinct base
  colors, sigma 25 noise) — day supervision will lean on it.
- **IR is domain-INVARIANT and class-informative** (one noisy band per
  class, identical day and night) — the paper's premise, and the anchor
  that makes night recoverable once features align.
- **Night RGB is severely out-of-distribution but class-preserving**:
  darkened 4x plus a blue cast. A day-only model collapses on night
  frames (measured: night mIoU ~0.08 vs day ~0.72), while feature
  alignment (fool-the-critics on the night branch) can either remap the
  darkened colors onto the day clusters or push the encoder onto the
  invariant IR — both raise night mIoU. (A first design instead
  PERMUTED colors to the next class; that made the wrong alignment
  self-consistent with the paired IR bands for even classes, so
  adaptation provably could not recover them — measured night gain
  -0.01. The shift must leave the task identifiable.)

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

# Night palette: GRAYSCALE (hue collapse to luma, slight dim + blue
# cast). Three designs were measured to get here (full progression in
# README "Does the adaptation work?"):
# 1. permuted class colors — unidentifiable (the wrong alignment was
#    self-consistent with IR for half the classes); gain -0.01.
# 2. darkened 4x — a per-channel AFFINE shift, which train-mode BN
#    absorbs outright: the batch-stats diagnostic showed base-arm night
#    already at 0.70 while the protocol eval's blended running stats
#    produced an artifact collapse to 0.14 that no seg-phase objective
#    can move; protocol gains were noise (+0.05/-0.02/-0.05) even as
#    the representation-level gain measured +0.16.
# 3. grayscale (this design) — non-invertible information LOSS that BN
#    cannot undo (8 of the 13 class lumas collide within noise), while
#    the global channel statistics stay day-like, so the protocol
#    running-stats eval is no longer artifact-dominated. IR is the only
#    way to separate the luma-colliding classes at night.
_LUMA = _COLORS @ np.array([0.299, 0.587, 0.114], np.float32)
_NIGHT_COLORS = 0.9 * np.stack([_LUMA] * 3, axis=1)
_NIGHT_COLORS[:, 2] += 8.0

# IR: one temperature band per class, identical day and night — the
# paper's premise is that IR is domain-invariant AND class-informative
# (that is why an IR teacher works at night). Band spacing 230 counts vs
# sigma 90 noise: informative but overlapping, not a trivial lookup.
# (An earlier design shared bands between class PAIRS to force RGB use;
# that capped what an aligned encoder could recover at night and the
# measured gain was only +0.05 — see README for the progression.)
_IR_CENTERS = np.linspace(22100.0, 24900.0, NUM_CLASSES).astype(np.float32)


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
    ir = _IR_CENTERS[label] + rng.randn(h, w).astype(np.float32) * 90.0
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


def train_teacher(args, dtype_name: str):
    """The night-supervision IR teacher (train_trgb_segnet_conf.py:210-229):
    an IR-only segnet trained supervised on DAY IR. IR is domain-invariant,
    so the day-trained teacher transfers to night by construction — the
    paper's central premise. Returns (teacher_model, teacher_variables)."""
    import jax
    import jax.numpy as jnp
    import optax

    from heatnet_tpu.models.trgb_segnet import ResNeXtSeg
    from heatnet_tpu.train.state import TrainState, init_model
    from heatnet_tpu.train.supervised import make_train_step

    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype_name]
    h, w, b = args.height, args.width, args.batch
    structure = tuple(int(s) for s in args.structure.split(","))
    model = ResNeXtSeg(structure=structure, input_channels=1, classes=13,
                       dtype=dtype)
    params, bs = init_model(model, jax.random.PRNGKey(5),
                            jnp.zeros((1, h, w, 1)), None,
                            init_kwargs={"train": True})
    state = TrainState.create(model.apply, params, bs,
                              optax.adam(args.lr))
    step = make_train_step(model)
    rng = np.random.RandomState(7 + 100 * args.seed)
    t0 = time.time()
    for i in range(args.steps_teacher):
        rgb, ir, label = batch_scenes(rng, b, h, w, night=False)
        _, ir_f = normalize_pair(rgb, ir)
        state, metrics = step(state, {"image": ir_f,
                                      "label": jnp.asarray(label, jnp.int32)})
    print(f"  [teacher] {args.steps_teacher} IR-only day steps in "
          f"{time.time() - t0:.1f}s, final loss "
          f"{float(metrics['loss']):.4f}", flush=True)
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def train_arm(arm: str, args, dtype_name: str, teacher=None):
    """One ablation arm; returns the mIoU dict.

    arm: 'base' (day supervision only), 'conf' (+ confusion critics),
    'pseudo' (+ IR-teacher night pseudo-labels), 'full' (both — THE
    reference recipe, train_trgb_segnet_conf.py:454-546).
    """
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.models.conf_segnet import ConfSegnet
    from heatnet_tpu.train.adversarial import (AdversarialConfig,
                                               AdversarialTrainState,
                                               PhaseMachine,
                                               make_adversarial_steps,
                                               make_phase_optimizers)
    from heatnet_tpu.train.state import init_model

    conf_on = arm in ("conf", "full")
    use_teacher = arm in ("pseudo", "full")
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[dtype_name]
    h, w, b = args.height, args.width, args.batch
    structure = tuple(int(s) for s in args.structure.split(","))

    # Scaled-down reference phase schedule (same shape as :157-159 — an
    # initial critic warm-up then critic/seg alternation); arms without
    # critics run seg-only (PhaseMachine(no_conf=True)) for the SAME
    # number of seg steps.
    cfg = AdversarialConfig(
        conf_weight=args.conf_weight if conf_on else 0.0,
        critic_weights=(1.0,) * 8,
        night_supervision=use_teacher,
        night_sup_modalities="ir",
        # moddrop in ALL arms (the recipe's own force-IR mechanism,
        # rectDropTensor :82-86): without it the day model free-rides on
        # clean RGB and never builds the IR pathways the night branch
        # needs. The ablations stay clean — arms differ only in
        # conf_weight / night_supervision.
        moddrop=not args.no_moddrop,
        iter_seg_phase=args.iter_seg,
        iter_critic_phase=args.iter_critic,
        iter_initial_critic_phase=args.iter_initial_critic,
    )
    model = ConfSegnet(disc_arch=args.disc_arch, num_critics=args.num_critics,
                       no_conf=not conf_on, structure=structure,
                       dtype=dtype, remat=False)

    ex = [jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 1))]
    params, batch_stats = init_model(model, jax.random.PRNGKey(0), ex, ex,
                                     init_kwargs={"train": True})
    seg_tx, critic_tx = make_phase_optimizers(args.lr)
    state = AdversarialTrainState.create(params, batch_stats, seg_tx,
                                         critic_tx)
    t_model, t_vars = teacher if use_teacher else (None, None)
    seg_step, critic_step = make_adversarial_steps(model, cfg, t_model,
                                                   t_vars)

    phase = PhaseMachine(cfg, no_conf=not conf_on)
    # identical day/night streams in both arms (same seeds)
    rng_day = np.random.RandomState(1 + 100 * args.seed)
    rng_night = np.random.RandomState(2 + 100 * args.seed)
    key = jax.random.PRNGKey(42 + args.seed)

    def next_batch():
        rgb_d, ir_d, label_d = batch_scenes(rng_day, b, h, w, night=False)
        rgb_n, ir_n, _ = batch_scenes(rng_night, b, h, w, night=True)
        rgb_df, ir_df = normalize_pair(rgb_d, ir_d)
        rgb_nf, ir_nf = normalize_pair(rgb_n, ir_n)
        # rect sized to the frame (the loader draws [100,300)x[100,500)
        # rects for 320-px frames, thermal_loader.py:661-666 — same
        # fractional coverage here)
        rh = rng_day.randint(h // 3, 2 * h // 3, size=b)
        rw = rng_day.randint(w // 6, w // 2, size=b)
        ri = (rng_day.rand(b) * (h - rh)).astype(np.int64)
        rj = (rng_day.rand(b) * (w - rw)).astype(np.int64)
        return {"rgb_day": rgb_df, "ir_day": ir_df,
                "rgb_night": rgb_nf, "ir_night": ir_nf,
                "label_day": jnp.asarray(label_d, jnp.int32),
                "mod_drop_params": jnp.asarray(
                    np.stack([ri, rj, rh, rw], 1), jnp.int32)}

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
                print(f"  [{arm}] it {it:5d} "
                      f"seg {seg_done:4d}/{args.steps_seg} "
                      f"seg_loss {float(metrics['seg_loss']):.4f} "
                      f"conf_loss {float(metrics['conf_loss']):.4f}",
                      flush=True)
        else:
            state, metrics = critic_step(state, batch)
        it += 1
    print(f"  [{arm}] {it} iters "
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

    @jax.jit
    def infer_batchstats(rgb, ir):
        # DIAGNOSTIC eval: batch statistics instead of the blended
        # day+night running averages (AdaBN-style renormalization). The
        # protocol eval stays `infer` (the validator runs model.eval(),
        # validation_bdd_mf.py:301); this one separates "representation
        # gap" (conf training's target) from "eval-stat mismatch"
        # (which no seg-phase objective can move).
        (seg, _, _), _ = eval_net.apply(eval_vars, rgb, ir, train=True,
                                        mutable=["batch_stats"])
        return jnp.argmax(seg, axis=-1)

    mious = {}
    for domain, night in (("day", False), ("night", True)):
        ev_rng = np.random.RandomState(1234 if night else 123)
        preds, preds_bs, labels = [], [], []
        for _ in range(args.eval_frames // b):
            rgb, ir, label = batch_scenes(ev_rng, b, h, w, night)
            rgb_f, ir_f = normalize_pair(rgb, ir)
            preds.append(np.asarray(infer(rgb_f, ir_f)))
            preds_bs.append(np.asarray(infer_batchstats(rgb_f, ir_f)))
            labels.append(label)
        iou = per_class_iou(np.concatenate(preds), np.concatenate(labels))
        iou_bs = per_class_iou(np.concatenate(preds_bs),
                               np.concatenate(labels))
        mious[domain] = float(np.nanmean(iou))
        mious[domain + "_bs"] = float(np.nanmean(iou_bs))
        print(f"  [{arm}] {domain} per-class "
              f"{np.round(iou, 3).tolist()} "
              f"(batch-stats diag mIoU {mious[domain + '_bs']:.4f})",
              flush=True)
    return mious


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-seg", type=int, default=300,
                    help="seg-phase steps per arm (equal in both arms)")
    ap.add_argument("--iter-seg", type=int, default=25)
    ap.add_argument("--iter-critic", type=int, default=50)
    ap.add_argument("--iter-initial-critic", type=int, default=100)
    ap.add_argument("--conf-weight", type=float, default=0.1)
    ap.add_argument("--num-critics", type=int, default=2,
                    help="critics over the first N taps (seg logits + the "
                         "fused decoder features)")
    ap.add_argument("--disc-arch", default="resnet18",
                    help="resnet18 pools/scores taps at any spatial size; "
                         "'cyclegan' (FCDiscriminator) needs >=32-px taps, "
                         "i.e. >=256-px frames for taps past the logits")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=128,
                    help="frame height; >=128 so the 1/4-res tap keeps "
                         ">=32 px for the FCDiscriminator conv stack")
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--eval-frames", type=int, default=32)
    ap.add_argument("--structure", default="1,1,1,1")
    ap.add_argument("--dtype", default="bf16", choices=("bf16", "f32"))
    ap.add_argument("--preset", choices=("tiny",), default=None,
                    help="tiny: CPU-runnable scale (the slow test's config)")
    ap.add_argument("--no-moddrop", action="store_true",
                    help="disable the rect modality dropout (on by "
                         "default in ALL arms)")
    ap.add_argument("--arms", default="base,conf,pseudo,full",
                    help="comma list of ablation arms to run")
    ap.add_argument("--steps-teacher", type=int, default=250,
                    help="supervised day-IR steps for the night-"
                         "supervision teacher")
    ap.add_argument("--seed", type=int, default=0,
                    help="offsets the TRAIN stream seeds (eval frames "
                         "stay fixed for comparability across seeds)")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    if args.preset == "tiny":
        # CPU-runnable scale for the slow test: big enough for the
        # teacher to learn IR->class (48x96/120-step frames measured a
        # null: teacher loss 0.46, full-arm day collapse 0.33)
        args.height, args.width, args.batch = 64, 128, 4
        args.steps_seg, args.eval_frames = 150, 16
        args.steps_teacher = 400
        args.iter_initial_critic, args.iter_critic, args.iter_seg = 40, 20, 20
        args.dtype = "f32"

    from heatnet_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    arms = args.arms.split(",")
    teacher = None
    if any(a in ("pseudo", "full") for a in arms):
        teacher = train_teacher(args, args.dtype)

    results = {}
    for arm in arms:
        results[arm] = train_arm(arm, args, args.dtype, teacher)

    print(f"\n{'arm':12s} {'day mIoU':>9s} {'night mIoU':>11s} "
          f"{'day(bs)':>9s} {'night(bs)':>10s}")
    for arm in arms:
        r = results[arm]
        print(f"{arm:12s} {r['day']:9.4f} {r['night']:11.4f} "
              f"{r['day_bs']:9.4f} {r['night_bs']:10.4f}")
    if "base" in results:
        for arm in arms:
            if arm == "base":
                continue
            print(f"night gain of '{arm}' over day-only: "
                  f"{results[arm]['night'] - results['base']['night']:+.4f}")
    if args.json:
        out = {}
        for arm in arms:
            for k, v in results[arm].items():
                out[f"{arm}_{k}_miou"] = round(v, 4)
        if "base" in results and "full" in results:
            out["night_gain_full"] = round(
                results["full"]["night"] - results["base"]["night"], 4)
        if "base" in results and "conf" in results:
            out["night_gain_conf"] = round(
                results["conf"]["night"] - results["base"]["night"], 4)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
