"""Optimizer and LR-schedule factories (optax).

Reference: ``create_optimizer`` / ``poly_lr_scheduler``
(``/root/reference/helper/utils.py:48-146``) — SGD/Adam from the JSON config
with step/multistep/exponential/constant/linear schedules — plus the trainers'
hardcoded choices: RMSprop + StepLR(gamma .5) for the adversarial trainer
(train_trgb_segnet_conf.py:270-274), Adam(0.5, 0.999) for CycleGAN
(cyclegan/train.py:141-146), poly LR for Vistas pretraining
(scripts/main.py:232).

Schedules are expressed as optax schedules over *steps*; epoch-mode schedules
take ``steps_per_epoch`` so jitted train steps never see host LR state.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import optax


def poly_lr(init_lr: float, max_iter: int = 100, power: float = 0.9) -> Callable:
    """``poly_lr_scheduler`` (helper/utils.py:71-84): lr·(1 - it/max)^power."""

    def schedule(count):
        import jax.numpy as jnp

        # clamp: past max_iter a negative frac**0.9 is NaN, which would
        # NaN-poison every parameter on the next update (e.g. resuming a
        # run beyond its original step budget)
        frac = jnp.maximum(1.0 - count / max_iter, 0.0)
        return init_lr * (frac ** power)

    return schedule


def step_lr(init_lr: float, step_size: int, gamma: float = 0.1,
            steps_per_epoch: int = 1) -> Callable:
    """torch ``StepLR`` (epoch-mode): lr·gamma^(epoch // step_size)."""

    def schedule(count):
        epoch = count // steps_per_epoch
        return init_lr * (gamma ** (epoch // step_size))

    return schedule


def multistep_lr(init_lr: float, milestones, gamma: float = 0.1,
                 steps_per_epoch: int = 1) -> Callable:
    import jax.numpy as jnp

    milestones_arr = sorted(milestones)

    def schedule(count):
        epoch = count // steps_per_epoch
        k = sum(jnp.where(epoch >= m, 1, 0) for m in milestones_arr)
        return init_lr * (gamma ** k)

    return schedule


def exponential_lr(init_lr: float, gamma: float, steps_per_epoch: int = 1) -> Callable:
    def schedule(count):
        return init_lr * (gamma ** (count // steps_per_epoch))

    return schedule


def linear_lr(init_lr: float, alpha: float, beta: float,
              steps_per_epoch: int = 1) -> Callable:
    """torch 'linear' LambdaLR (helper/utils.py:139-143): lr·(it·α + β)."""

    def schedule(count):
        return init_lr * ((count // steps_per_epoch) * alpha + beta)

    return schedule


def lambda_linear_decay(n_epochs: int, offset: int, decay_start_epoch: int,
                        init_lr: float, steps_per_epoch: int = 1) -> Callable:
    """CycleGAN ``LambdaLR`` (utils.py:115-123): flat then linear to zero.

    Traceable (called with a jit-traced step count inside optax)."""
    import jax.numpy as jnp

    def schedule(count):
        epoch = count // steps_per_epoch
        f = 1.0 - jnp.maximum(0, epoch + offset - decay_start_epoch) / (
            n_epochs - decay_start_epoch)
        return init_lr * f

    return schedule


def make_schedule(optimizer_config: Dict[str, Any],
                  steps_per_epoch: int = 1) -> Callable:
    """Schedule from the JSON ``optimizer.schedule`` section."""
    lr = optimizer_config["learning_rate"]
    sched = optimizer_config.get("schedule", {"type": "constant"})
    stype = sched.get("type", "constant")
    params = sched.get("params", {})
    spe = steps_per_epoch if sched.get("mode", "epoch") == "epoch" else 1
    if stype == "constant":
        return lambda count: lr
    if stype == "step":
        return step_lr(lr, params["step_size"], params.get("gamma", 0.1), spe)
    if stype == "multistep":
        return multistep_lr(lr, params["milestones"], params.get("gamma", 0.1), spe)
    if stype == "exponential":
        return exponential_lr(lr, params["gamma"], spe)
    if stype == "linear":
        return linear_lr(lr, params["alpha"], params["beta"], spe)
    raise KeyError(f"unrecognized schedule {stype}")


def create_optimizer(optimizer_config: Dict[str, Any],
                     steps_per_epoch: int = 1,
                     schedule: Optional[Callable] = None) -> optax.GradientTransformation:
    """Optimizer from the JSON config (helper/utils.py:86-146 semantics).

    Gradient clipping (``clip`` > 0, scripts/main.py:256-257) composes in
    front; weight decay is additive like torch's, not decoupled.
    """
    sched = schedule or make_schedule(optimizer_config, steps_per_epoch)
    otype = optimizer_config.get("type", "SGD")
    wd = optimizer_config.get("weight_decay", 0.0)

    if otype == "SGD":
        tx = optax.sgd(
            learning_rate=sched,
            momentum=optimizer_config.get("momentum", 0.9),
            nesterov=optimizer_config.get("nesterov", False),
        )
    elif otype == "Adam":
        tx = optax.adam(learning_rate=sched)
    elif otype == "RMSprop":
        # torch RMSprop defaults: alpha .99, eps 1e-8 (adversarial trainer).
        # eps_in_sqrt=False matches torch's sqrt(nu) + eps denominator;
        # optax's default sqrt(nu + eps) floors the denom at 1e-4 and makes
        # small-moment updates up to 1e4x smaller than the reference.
        tx = optax.rmsprop(learning_rate=sched, decay=0.99, eps=1e-8,
                           eps_in_sqrt=False)
    else:
        raise KeyError(f"unrecognized optimizer {otype}")

    parts = []
    clip = optimizer_config.get("clip", 0)
    if clip and clip > 0:
        parts.append(optax.clip_by_global_norm(clip))
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(tx)
    out = optax.chain(*parts) if len(parts) > 1 else tx
    # HEATNET_FLAT_OPT=1: one fused update over a flat buffer — measured
    # 617.0 -> 575.6 ms on the Vistas B=30 step (-6.7%). Opt-in because
    # optax.flatten changes the opt_state checkpoint layout (resuming a
    # tree-layout checkpoint requires the same flag setting).
    return maybe_flatten(out)


def masked_optimizer(tx: optax.GradientTransformation,
                     mask) -> optax.GradientTransformation:
    """Freeze parameters outside ``mask`` — the functional replacement for
    ``requires_grad`` phase flipping (conf_segnet.py:90-104).

    ``mask`` is a pytree-of-bools (or callable) matching the params tree;
    masked-out leaves get zero updates AND contribute no optimizer state
    updates, so alternating phases don't perturb each other's moments.
    """
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        (lambda params: _mask_to_labels(mask(params) if callable(mask) else mask)),
    )


def _mask_to_labels(mask_tree):
    import jax

    return jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask_tree)


def maybe_flatten(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    """Opt-in flat-buffer optimizer (``HEATNET_FLAT_OPT=1``): wrap ``tx``
    in ``optax.flatten`` so the whole update runs as ONE fused kernel
    over a single concatenated vector instead of one fusion per leaf.

    Measured (v5e, tools/bench_residual_micro.py + bench_train_step.py,
    2026-08-21): in ISOLATION the per-leaf tree update is near its byte
    floor (2.22 ms vs 1.34 floor on the 39.2M-param Vistas tree;
    flattened 3.18) — but in the FULL Vistas B=30 step the flag measures
    **617.0 -> 575.6 ms (-6.7%)**: the per-op table's ~85 ms optimizer
    attribution was per-leaf fusion scheduling overhead in the big
    graph, not update-math throughput, and one fused flat update
    recovers ~41 ms of it. Opt-in (not default) because flattening
    changes the opt_state checkpoint layout: resuming a checkpoint
    requires the same flag setting it was written with.
    """
    import os

    if os.environ.get("HEATNET_FLAT_OPT") == "1":
        return optax.flatten(tx)
    return tx
