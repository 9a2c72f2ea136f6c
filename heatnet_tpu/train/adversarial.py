"""Two-phase adversarial confusion-maximization trainer.

Reference: ``train_trgb_segnet_conf.py`` — THE core HeatNet training stack:

- two phases, ``train_seg`` / ``train_critic``, alternating on an iteration
  counter (1000 initial critic iters, then 500 critic ↔ 50 seg; :157-159,
  :361-367, :576-592);
- phase "freezing" via ``requires_grad`` flips (conf_segnet.py:90-104);
- critic loss: Σ_i conf(c_a_i → 1) + conf(c_b_i → 0) (:437-446, :563-574);
- seg loss: day CE + optional night pseudo-label CE from a frozen teacher
  (3 weighting modes, :454-480) + optional certainty MSE (:482-491) +
  ``conf_weight`` · confusion loss driving critics toward the wrong label
  (:525-546);
- one RMSprop over everything + StepLR(gamma .5) (:270-274).

TPU-native design (SURVEY.md §7 hard parts): the model stays pure; there are
TWO jitted step functions sharing one parameter tree but each updating only
its phase's parameter subtree with its own optimizer state — the functional
equivalent of ``requires_grad`` flips, with per-subtree RMSprop moments
exactly like torch (frozen params' state untouched). The phase switch is a
host-side counter; both steps are compiled once.

Cost note: both steps differentiate w.r.t. the FULL param tree, but the
masked optimizer maps frozen subtrees' updates through ``set_to_zero`` —
their grads are dead values and XLA eliminates the frozen segnet's backward
from the critic step entirely (measured compiled-FLOPs ratio critic/seg
≈ 0.41; regression-guarded by
tests/test_train.py::test_critic_step_dead_segnet_backward_is_eliminated).
Do not replace the masking with anything that reads the frozen grads.

The reference's per-phase masking of trainables: ``setPhase`` toggles only
``critics[*]`` and ``trgb_segnet`` — downscale nets, input adapter, and the
adapter critic stay trainable in BOTH phases; the subtree split below mirrors
that exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..ops.preprocess import (
    ir_scale_aug,
    maybe_smart_augment,
    rect_drop,
)
from .supervised import cross_entropy_ignore


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AdversarialConfig:
    """Loss/augmentation knobs (flag surface of train_trgb_segnet_conf.py)."""

    adv_loss: str = "MSE"  # MSE | BCE (:237-242)
    conf_weight: float = 0.1
    critic_weights: Tuple[float, ...] = (1.0,) * 7
    multidir: bool = False
    cert_branch: bool = False
    weight_ir_sup: bool = False
    night_supervision: bool = False
    modalities: str = "ir_rgb"
    moddrop: bool = False
    irscale: bool = False
    smartirscale: bool = False
    num_classes: int = 13
    night_sup_modalities: str = "ir"  # teacher inputs (:432): "ir" or "ir_rgb"
    # phase schedule (:157-159)
    iter_seg_phase: int = 50
    iter_critic_phase: int = 500
    iter_initial_critic_phase: int = 1000


def conf_criterion(kind: str) -> Callable[[jax.Array, float], jax.Array]:
    """MSE / BCEWithLogits against a constant target, mean-reduced."""
    if kind == "MSE":
        return lambda x, t: jnp.mean((x.astype(jnp.float32) - t) ** 2)
    if kind == "BCE":
        def bce(x, t):
            x = x.astype(jnp.float32)
            # BCEWithLogits with constant target t
            return jnp.mean(jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x))))
        return bce
    raise ValueError(f"Loss not known : {kind}")


# ---------------------------------------------------------------------------
# Train state with per-phase optimizer states
# ---------------------------------------------------------------------------


def _is_critic_key(k: str) -> bool:
    # NOT adapter_disc: the reference setPhase toggles only the critics
    # list and trgb_segnet (conf_segnet.py:90-104) — the adapter critic
    # keeps requires_grad in BOTH phases, so it receives updates from the
    # seg phase's confusion term too.
    return k.startswith("critics_")


def _is_segnet_key(k: str) -> bool:
    return k == "trgb_segnet"


def seg_phase_mask(params) -> Any:
    """Trainable in seg phase: everything except the critics (conf_segnet
    setPhase('train_seg'): critics frozen, segnet on)."""
    return {k: jax.tree_util.tree_map(lambda _: not _is_critic_key(k), v)
            for k, v in params.items()}


def critic_phase_mask(params) -> Any:
    """Trainable in critic phase: everything except trgb_segnet."""
    return {k: jax.tree_util.tree_map(lambda _: not _is_segnet_key(k), v)
            for k, v in params.items()}


class AdversarialTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    seg_opt_state: Any
    critic_opt_state: Any
    seg_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    critic_tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, seg_tx, critic_tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            seg_opt_state=seg_tx.init(params),
            critic_opt_state=critic_tx.init(params),
            seg_tx=seg_tx,
            critic_tx=critic_tx,
        )


def make_phase_optimizers(lr_schedule) -> Tuple[optax.GradientTransformation,
                                                optax.GradientTransformation]:
    """Two masked RMSprop transforms over the same param tree.

    torch RMSprop defaults (alpha .99, eps 1e-8) as in the reference (:270);
    masked-out leaves receive zero updates and keep untouched moments.
    """

    from .optim import masked_optimizer

    def rmsprop():
        # eps_in_sqrt=False: torch's sqrt(nu) + eps denominator (optax's
        # default sqrt(nu + eps) floors the denom at 1e-4 — see optim.py)
        return optax.rmsprop(learning_rate=lr_schedule, decay=0.99, eps=1e-8,
                             eps_in_sqrt=False)

    seg_tx = masked_optimizer(rmsprop(), seg_phase_mask)
    critic_tx = masked_optimizer(rmsprop(), critic_phase_mask)
    return seg_tx, critic_tx


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def critic_loss(out: Dict[str, Any], criterion) -> jax.Array:
    """Σ_i conf(c_a_i → 1) + conf(c_b_i → 0) (:437-446)."""
    total = 0.0
    for c_a in out["critics_a"]:
        total += criterion(c_a, 1.0)
    for c_b in out["critics_b"]:
        total += criterion(c_b, 0.0)
    return total


def confusion_loss(out: Dict[str, Any], criterion, cfg: AdversarialConfig,
                   conf_weighting: Optional[jax.Array] = None) -> jax.Array:
    """Fool-the-critics term of the seg phase (:525-546).

    The reference multiplies the scalar mean-reduced criterion by a resized
    weighting map and means again — algebraically ``criterion · mean(w)``;
    reproduced exactly (with w≡1 when no ir-uncertainty weighting).
    """
    weights = cfg.critic_weights
    loss = 0.0
    w_mean = (jnp.mean(conf_weighting.astype(jnp.float32))
              if conf_weighting is not None else 1.0)
    for m, c_a in enumerate(out["critics_a"]):
        target = 0.0 if cfg.multidir else 1.0
        loss += w_mean * criterion(c_a, target) * weights[m]
    for m, c_b in enumerate(out["critics_b"]):
        loss += w_mean * criterion(c_b, 1.0) * weights[m]
    return loss


def cert_target(pred_logits: jax.Array, label: jax.Array,
                num_classes: int) -> jax.Array:
    """Certainty GT: 1 - softmax prob of the true class (:482-488)."""
    probs = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(jnp.clip(label, 0, num_classes - 1), num_classes)
    cert = jnp.sum(onehot * probs, axis=-1)
    return 1.0 - cert


# ---------------------------------------------------------------------------
# Step builders
# ---------------------------------------------------------------------------


def _pack_inputs(batch: Dict[str, jax.Array], modalities: str, day: bool):
    sfx = "day" if day else "night"
    ins = []
    if "rgb" in modalities:
        ins.append(batch[f"rgb_{sfx}"])
    if "ir" in modalities:
        ins.append(batch[f"ir_{sfx}"])
    if not ins:
        raise ValueError("No known modality selected")
    return ins


def _apply_train(model, params, batch_stats, in_day, in_night, rng=None):
    variables = {"params": params}
    mutable = False
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"]
    # PSPNet arch uses Dropout(0.3/0.15) at train time (pspnet.py:50-57)
    rngs = {"dropout": rng} if rng is not None else None
    out = model.apply(variables, in_day, in_night, train=True,
                      mutable=mutable, rngs=rngs)
    if mutable:
        out, new_vars = out
        return out, new_vars.get("batch_stats")
    return out, None


def _augment_day(key, batch, cfg: AdversarialConfig):
    """Seg-phase input augmentations (:394-410): rect modality drop (one of
    rgb/ir, p=.5 overall), IR scale (p=.5), smart per-class IR scale (p=.5)."""
    rgb_day, ir_day = batch["rgb_day"], batch["ir_day"]
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    if cfg.moddrop:
        do = jax.random.uniform(k1) > 0.5
        drop_rgb = jax.random.uniform(k2) > 0.5
        params = batch["mod_drop_params"]
        rgb_dropped = rect_drop(rgb_day, params)
        ir_dropped = rect_drop(ir_day, params)
        rgb_day = jnp.where(do & drop_rgb, rgb_dropped, rgb_day)
        ir_day = jnp.where(do & ~drop_rgb, ir_dropped, ir_day)
    if cfg.irscale:
        ir_day = ir_scale_aug(k3, ir_day)
    if cfg.smartirscale:
        ir_day = maybe_smart_augment(k4, ir_day, batch["label_day"],
                                     cfg.num_classes + 1)
    return dict(batch, rgb_day=rgb_day, ir_day=ir_day)


def make_adversarial_steps(model, cfg: AdversarialConfig,
                           teacher: Optional[Any] = None,
                           teacher_variables: Optional[Any] = None):
    """Build (seg_step, critic_step), both jitted.

    ``teacher`` is the frozen night-supervision model (+ its variables);
    its pseudo-labels supervise the night branch (:430-480).
    """
    criterion = conf_criterion(cfg.adv_loss)

    def forward_teacher(batch):
        # teacher input: IR only unless it is a 4-channel model (:432)
        ins = _pack_inputs(batch, cfg.night_sup_modalities, day=False)
        out, _, t_cert = teacher.apply(teacher_variables, *ins, train=False)
        return jax.nn.softmax(out.astype(jnp.float32), axis=-1), t_cert

    def seg_loss_fn(params, batch_stats, batch, key):
        k_aug, k_drop = jax.random.split(key)
        batch = _augment_day(k_aug, batch, cfg)
        in_day = _pack_inputs(batch, cfg.modalities, day=True)
        in_night = _pack_inputs(batch, cfg.modalities, day=False)
        out, new_bs = _apply_train(model, params, batch_stats, in_day,
                                   in_night, rng=k_drop)

        label_day = batch["label_day"].astype(jnp.int32)
        seg_loss = cross_entropy_ignore(out["pred_label_a"], label_day,
                                        ignore_index=-1)  # plain CE (:244)
        metrics = {}
        conf_weighting = None

        if cfg.night_supervision and teacher is not None:
            night_probs, t_cert = forward_teacher(batch)
            pseudo = jnp.argmax(night_probs, axis=-1)
            if not cfg.weight_ir_sup:
                night_loss = cross_entropy_ignore(
                    out["pred_label_b"], pseudo, ignore_index=-1)
            elif cfg.weight_ir_sup and cfg.cert_branch and t_cert is not None:
                per_pix = cross_entropy_ignore(
                    out["pred_label_b"], pseudo, ignore_index=-1, reduce=False)
                night_loss = jnp.mean((1.0 - t_cert[..., 0]) * per_pix)
            else:
                per_pix = cross_entropy_ignore(
                    out["pred_label_b"], pseudo, ignore_index=-1, reduce=False)
                cert = jnp.max(jax.nn.softmax(night_probs, axis=-1), axis=-1)
                night_loss = jnp.mean(cert * per_pix)
                if cfg.weight_ir_sup:
                    conf_weighting = 1.0 - cert
            seg_loss = seg_loss + night_loss
            metrics["night_seg_loss"] = night_loss

        if cfg.cert_branch and not cfg.night_supervision:
            cert_gt = cert_target(out["pred_label_a"], label_day,
                                  out["pred_label_a"].shape[-1])
            cert_loss = jnp.mean((out["cert_a"][..., 0] - cert_gt) ** 2) * 10.0
            seg_loss = seg_loss + cert_loss
            metrics["cert_loss"] = cert_loss

        if "critics_a" in out:
            conf = confusion_loss(out, criterion, cfg, conf_weighting)
            total = seg_loss + cfg.conf_weight * conf
            metrics["conf_loss"] = conf
        else:
            total = seg_loss
            metrics["conf_loss"] = jnp.zeros(())

        metrics["seg_loss"] = seg_loss
        metrics["total_loss"] = total
        return total, (new_bs, metrics)

    def critic_loss_fn(params, batch_stats, batch, step):
        in_day = _pack_inputs(batch, cfg.modalities, day=True)
        in_night = _pack_inputs(batch, cfg.modalities, day=False)
        # critic phase keeps train-mode dropout in the segnet (the reference
        # never flips .eval() between phases); key derived from the step
        k_drop = jax.random.fold_in(jax.random.PRNGKey(1), step)
        out, new_bs = _apply_train(model, params, batch_stats, in_day,
                                   in_night, rng=k_drop)
        loss = critic_loss(out, criterion)
        return loss, (new_bs, {"critic_loss": loss, "total_loss": loss})

    @jax.jit
    def seg_step(state: AdversarialTrainState, batch, key):
        (loss, (new_bs, metrics)), grads = jax.value_and_grad(
            seg_loss_fn, has_aux=True)(state.params, state.batch_stats,
                                       batch, key)
        updates, new_opt = state.seg_tx.update(grads, state.seg_opt_state,
                                               state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_bs if new_bs is not None else state.batch_stats,
            seg_opt_state=new_opt), metrics

    @jax.jit
    def critic_step(state: AdversarialTrainState, batch):
        (loss, (new_bs, metrics)), grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True)(state.params, state.batch_stats,
                                          batch, state.step)
        updates, new_opt = state.critic_tx.update(grads, state.critic_opt_state,
                                                  state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_bs if new_bs is not None else state.batch_stats,
            critic_opt_state=new_opt), metrics

    return seg_step, critic_step


class PhaseMachine:
    """Host-side phase switcher (:361-367, :576-592).

    Starts in ``train_critic`` for ``iter_initial_critic_phase`` iterations
    (unless no_conf), then alternates critic/seg phases.
    """

    def __init__(self, cfg: AdversarialConfig, no_conf: bool = False):
        self.cfg = cfg
        self.no_conf = no_conf
        self.state = "train_seg" if no_conf else "train_critic"
        self.counter = cfg.iter_initial_critic_phase

    def tick(self) -> str:
        """Returns the phase for the *current* iteration, then advances."""
        phase = self.state
        if not self.no_conf:
            self.counter -= 1
            if self.counter == 0:
                if self.state == "train_seg":
                    self.state = "train_critic"
                    self.counter = self.cfg.iter_critic_phase
                else:
                    self.state = "train_seg"
                    self.counter = self.cfg.iter_seg_phase
        return phase
