"""Trainer tests: supervised step, adversarial two-phase semantics.

Key invariants from the reference (conf_segnet.setPhase, :90-104): the critic
phase must not move trgb_segnet parameters; the seg phase must not move
critic parameters; downscale/adapter subtrees may move in both.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from heatnet_tpu.models import ConfSegnet, ResNeXtSeg
from heatnet_tpu.train.adversarial import (
    AdversarialConfig,
    AdversarialTrainState,
    PhaseMachine,
    conf_criterion,
    make_adversarial_steps,
    make_phase_optimizers,
)
from heatnet_tpu.train.state import TrainState, init_model
from heatnet_tpu.train.supervised import cross_entropy_ignore, make_train_step
from heatnet_tpu.train import optim

TINY = (1, 1, 1, 1)


def _tree_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_cross_entropy_ignore_matches_manual():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 4, 4, 3), jnp.float32)
    labels = jnp.asarray(np.random.RandomState(1).randint(0, 3, (2, 4, 4)))
    labels = labels.at[0, 0, 0].set(13)
    loss = cross_entropy_ignore(logits, labels)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ref, count = 0.0, 0
    for n in range(2):
        for i in range(4):
            for j in range(4):
                l = int(labels[n, i, j])
                if l == 13:
                    continue
                ref -= float(logp[n, i, j, l])
                count += 1
    assert float(loss) == pytest.approx(ref / count, rel=1e-5)


def test_supervised_train_step_decreases_loss():
    model = ResNeXtSeg(structure=TINY, input_channels=3)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 13, (2, 64, 64))),
    }
    params, bs = init_model(model, jax.random.PRNGKey(0),
                            batch["image"], None, init_kwargs={"train": True})
    state = TrainState.create(model.apply, params, bs, optax.adam(1e-3))
    step = make_train_step(model)
    losses = []
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 5


def test_conf_criterion_values():
    mse = conf_criterion("MSE")
    x = jnp.asarray([[0.0, 2.0]])
    assert float(mse(x, 1.0)) == pytest.approx(1.0)
    bce = conf_criterion("BCE")
    x = jnp.zeros((2, 2))
    assert float(bce(x, 1.0)) == pytest.approx(np.log(2), rel=1e-5)
    assert float(bce(x, 0.0)) == pytest.approx(np.log(2), rel=1e-5)
    with pytest.raises(ValueError):
        conf_criterion("L1")


def test_phase_machine_schedule():
    cfg = AdversarialConfig(iter_seg_phase=2, iter_critic_phase=3,
                            iter_initial_critic_phase=4)
    pm = PhaseMachine(cfg)
    seq = [pm.tick() for _ in range(12)]
    assert seq == (["train_critic"] * 4 + ["train_seg"] * 2 +
                   ["train_critic"] * 3 + ["train_seg"] * 2 + ["train_critic"])
    pm2 = PhaseMachine(cfg, no_conf=True)
    assert [pm2.tick() for _ in range(3)] == ["train_seg"] * 3


def _adv_fixture(cfg=None):
    cfg = cfg or AdversarialConfig(moddrop=True, irscale=True, smartirscale=True)
    model = ConfSegnet(disc_arch="resnet18", num_critics=2, structure=TINY)
    rng = np.random.RandomState(0)
    batch = {
        "rgb_day": jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32),
        "ir_day": jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32),
        "rgb_night": jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32),
        "ir_night": jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32),
        "label_day": jnp.asarray(rng.randint(0, 13, (2, 64, 64))),
        "mod_drop_params": jnp.asarray([[5, 5, 20, 20], [0, 0, 10, 10]]),
    }
    in_day = [batch["rgb_day"], batch["ir_day"]]
    params, bs = init_model(model, jax.random.PRNGKey(0), in_day, in_day,
                            init_kwargs={"train": True})
    seg_tx, critic_tx = make_phase_optimizers(lambda _: 1e-4)
    state = AdversarialTrainState.create(params, bs, seg_tx, critic_tx)
    seg_step, critic_step = make_adversarial_steps(model, cfg)
    return model, cfg, batch, state, seg_step, critic_step


def test_adversarial_phase_param_isolation():
    model, cfg, batch, state, seg_step, critic_step = _adv_fixture()

    s1, m1 = critic_step(state, batch)
    # critic phase: segnet untouched, critics moved
    assert _tree_equal(s1.params["trgb_segnet"], state.params["trgb_segnet"])
    assert not _tree_equal(s1.params["critics_0"], state.params["critics_0"])
    assert np.isfinite(float(m1["critic_loss"]))

    s2, m2 = seg_step(state, batch, jax.random.PRNGKey(1))
    # seg phase: critics untouched, segnet moved
    assert _tree_equal(s2.params["critics_0"], state.params["critics_0"])
    assert _tree_equal(s2.params["critics_1"], state.params["critics_1"])
    assert not _tree_equal(s2.params["trgb_segnet"], state.params["trgb_segnet"])
    for k in ("seg_loss", "conf_loss", "total_loss"):
        assert np.isfinite(float(m2[k]))


def test_critic_step_dead_segnet_backward_is_eliminated():
    """The critic phase must not pay for the frozen segnet's backward.

    critic_step takes grads w.r.t. the full param tree and relies on the
    masked optimizer's ``set_to_zero`` making the segnet grads dead values
    that XLA dead-code-eliminates (train/adversarial.py). If masking ever
    switches to a passthrough that *reads* those grads, the critic phase —
    ~90% of training iterations under the reference schedule (500 critic per
    50 seg) — silently pays the dominant segnet backward again. Measured
    compiled-FLOPs ratio is ~0.41 (fwd-only segnet + critic fwd/bwd vs full
    fwd+bwd); assert a generous ceiling.
    """
    model, cfg, batch, state, seg_step, critic_step = _adv_fixture()
    critic_flops = critic_step.lower(state, batch).compile().cost_analysis()["flops"]
    seg_flops = seg_step.lower(
        state, batch, jax.random.PRNGKey(1)).compile().cost_analysis()["flops"]
    assert critic_flops < 0.7 * seg_flops, (
        f"critic step FLOPs {critic_flops:.3e} vs seg {seg_flops:.3e}: "
        "frozen-segnet backward is being computed")


def test_adversarial_no_conf_plain_ce():
    cfg = AdversarialConfig()
    model = ConfSegnet(disc_arch="resnet18", num_critics=2, structure=TINY,
                       no_conf=True)
    rng = np.random.RandomState(0)
    batch = {
        "rgb_day": jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32),
        "ir_day": jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32),
        "rgb_night": jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32),
        "ir_night": jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32),
        "label_day": jnp.asarray(rng.randint(0, 13, (1, 64, 64))),
    }
    in_day = [batch["rgb_day"], batch["ir_day"]]
    params, bs = init_model(model, jax.random.PRNGKey(0), in_day, in_day,
                            init_kwargs={"train": True})
    seg_tx, critic_tx = make_phase_optimizers(lambda _: 1e-4)
    state = AdversarialTrainState.create(params, bs, seg_tx, critic_tx)
    seg_step, _ = make_adversarial_steps(model, cfg)
    s, m = seg_step(state, batch, jax.random.PRNGKey(0))
    assert float(m["conf_loss"]) == 0.0
    assert float(m["total_loss"]) == pytest.approx(float(m["seg_loss"]))


def test_adversarial_night_supervision_teacher():
    cfg = AdversarialConfig(night_supervision=True, night_sup_modalities="ir")
    model = ConfSegnet(disc_arch="resnet18", num_critics=2, structure=TINY)
    teacher = ResNeXtSeg(structure=TINY, input_channels=1)
    rng = np.random.RandomState(0)
    batch = {
        "rgb_day": jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32),
        "ir_day": jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32),
        "rgb_night": jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32),
        "ir_night": jnp.asarray(rng.rand(1, 64, 64, 1), jnp.float32),
        "label_day": jnp.asarray(rng.randint(0, 13, (1, 64, 64))),
    }
    in_day = [batch["rgb_day"], batch["ir_day"]]
    params, bs = init_model(model, jax.random.PRNGKey(0), in_day, in_day,
                            init_kwargs={"train": True})
    t_params, t_bs = init_model(teacher, jax.random.PRNGKey(1),
                                batch["ir_night"], None)
    t_vars = {"params": t_params}
    if t_bs is not None:
        t_vars["batch_stats"] = t_bs
    seg_tx, critic_tx = make_phase_optimizers(lambda _: 1e-4)
    state = AdversarialTrainState.create(params, bs, seg_tx, critic_tx)
    seg_step, _ = make_adversarial_steps(model, cfg, teacher, t_vars)
    s, m = seg_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["night_seg_loss"]))
    assert float(m["total_loss"]) > 0


def test_optim_schedules():
    s = optim.poly_lr(1.0, max_iter=100, power=0.9)
    assert s(0) == pytest.approx(1.0)
    assert s(50) == pytest.approx(0.5 ** 0.9)
    st = optim.step_lr(1.0, step_size=30, gamma=0.5, steps_per_epoch=10)
    assert st(0) == 1.0 and st(299) == 1.0 and st(300) == 0.5 and st(600) == 0.25
    lam = optim.lambda_linear_decay(200, 0, 100, 1.0)
    assert lam(0) == 1.0 and lam(150) == pytest.approx(0.5) and lam(200) == 0.0
    cfg = {"learning_rate": 0.1, "type": "Adam",
           "schedule": {"type": "constant"}}
    tx = optim.create_optimizer(cfg)
    assert tx is not None


def test_supervised_training_converges():
    """Optimizer/step correctness: 40 steps on one fixed tiny batch must
    drive the CE loss down substantially (memorization sanity — catches
    sign errors, LR plumbing, BN-state loss, gradient masking)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from heatnet_tpu.models import ResNeXtSeg
    from heatnet_tpu.train.state import TrainState, init_model
    from heatnet_tpu.train.supervised import make_train_step

    model = ResNeXtSeg(structure=(1, 1, 1, 1), input_channels=3,
                       classes=5, remat=True)
    rng = np.random.RandomState(0)
    img = rng.rand(2, 64, 64, 3).astype(np.float32)
    # learnable labels (a deterministic function of the input); random
    # per-pixel labels have no signal to descend on in 40 steps
    lab = (img.mean(-1) * 4.99).astype(np.int32)
    batch = {"image": img, "label": lab}
    params, bs = init_model(model, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)), None,
                            init_kwargs={"train": True})
    state = TrainState.create(model.apply, params, bs, optax.adam(1e-3))
    step = make_train_step(model)

    first = None
    for i in range(40):
        state, metrics = step(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last)
    assert last < first * 0.8, (first, last)


def test_stat_named_bn_identical_and_remat_policy_grads():
    """StatNamedBatchNorm must be bit-identical to nn.BatchNorm (same
    params/batch_stats layout — checkpoint compatibility), and the
    BN-stats-saving remat policy must not change training gradients
    (it only skips recomputing the stat reduces in the re-forward)."""
    from flax import linen as nn

    from heatnet_tpu.models.layers import StatNamedBatchNorm

    x = jnp.asarray(np.random.RandomState(0).rand(4, 8, 8, 16), jnp.float32)
    kw = dict(use_running_average=False, momentum=0.9, epsilon=1e-5)
    ref, new = nn.BatchNorm(**kw), StatNamedBatchNorm(**kw)
    variables = ref.init(jax.random.PRNGKey(0), x)
    y_ref, mut_ref = ref.apply(variables, x, mutable=["batch_stats"])
    y_new, mut_new = new.apply(variables, x, mutable=["batch_stats"])
    assert jnp.array_equal(y_ref, y_new)
    for k in ("mean", "var"):
        assert jnp.array_equal(mut_ref["batch_stats"][k],
                               mut_new["batch_stats"][k])

    img = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3),
                      jnp.float32)
    lab = jnp.asarray(
        (np.random.RandomState(2).rand(2, 64, 64) * 4.9).astype(np.int32))
    grads, losses = {}, {}
    for remat in (False, True):
        model = ResNeXtSeg(structure=TINY, input_channels=3, classes=5,
                           remat=remat)
        params, bs = init_model(model, jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)), None,
                                init_kwargs={"train": True})

        def loss_fn(p):
            (seg, _, _), mut = model.apply(
                {"params": p, "batch_stats": bs}, img, None, train=True,
                mutable=["batch_stats"])
            return optax.softmax_cross_entropy_with_integer_labels(
                seg.astype(jnp.float32), lab).mean(), mut

        (losses[remat], _), grads[remat] = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(params)
    assert abs(float(losses[False] - losses[True])) < 1e-6
    deltas = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(grads[False]),
        jax.tree_util.tree_leaves(grads[True]))]
    assert max(deltas) < 1e-4, max(deltas)


def test_conv_save_remat_mode_grads_identical(monkeypatch):
    """The 'c' stage-remat mode (HEATNET_REMAT_STAGES, CONV_SAVE_POLICY:
    conv outputs saved by name so the backward re-forward needs no conv
    recompute) must be a pure scheduling choice — losses and gradients
    bit-comparable to full remat ('1') and save-everything ('0') within
    fp32 accumulation tolerance, for uniform and mixed masks."""
    img = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3),
                      jnp.float32)
    lab = jnp.asarray(
        (np.random.RandomState(2).rand(2, 64, 64) * 4.9).astype(np.int32))

    def grads_for(mask):
        monkeypatch.setenv("HEATNET_REMAT_STAGES", mask)
        model = ResNeXtSeg(structure=TINY, input_channels=3, classes=5,
                           remat=True)
        params, bs = init_model(model, jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3)), None,
                                init_kwargs={"train": True})

        def loss_fn(p):
            (seg, _, _), mut = model.apply(
                {"params": p, "batch_stats": bs}, img, None, train=True,
                mutable=["batch_stats"])
            return optax.softmax_cross_entropy_with_integer_labels(
                seg.astype(jnp.float32), lab).mean(), mut

        (loss, _), g = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True))(params)
        return float(loss), g

    results = {m: grads_for(m) for m in ("1111", "cccc", "0000", "c1c0")}
    base_loss, base_g = results["1111"]
    for mask, (loss, g) in results.items():
        assert abs(loss - base_loss) < 1e-6, (mask, loss, base_loss)
        deltas = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(
            jax.tree_util.tree_leaves(base_g), jax.tree_util.tree_leaves(g))]
        assert max(deltas) < 1e-4, (mask, max(deltas))


def test_flat_opt_identical_updates(monkeypatch):
    """HEATNET_FLAT_OPT=1 (optax.flatten single-fused update; measured
    617.0 -> 575.6 ms on the Vistas B=30 step) must be pure scheduling:
    one supervised step produces bit-comparable params vs the tree-layout
    default on the same grads."""
    import optax

    from heatnet_tpu.models import ResNeXtSeg
    from heatnet_tpu.train.optim import create_optimizer, maybe_flatten
    from heatnet_tpu.train.state import TrainState, init_model
    from heatnet_tpu.train.supervised import make_train_step

    model = ResNeXtSeg(structure=(1, 1, 1, 1), input_channels=3,
                       classes=14, dtype=jnp.float32)
    params, bs = init_model(model, jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 64, 3)), None,
                            init_kwargs={"train": True})
    batch = {
        "image": np.random.RandomState(0).rand(2, 32, 64, 3)
        .astype(np.float32),
        "label": np.random.RandomState(1).randint(0, 14, (2, 32, 64))
        .astype(np.int32),
    }

    def one_step(flat):
        if flat:
            monkeypatch.setenv("HEATNET_FLAT_OPT", "1")
        else:
            monkeypatch.delenv("HEATNET_FLAT_OPT", raising=False)
        tx = create_optimizer({"type": "Adam", "learning_rate": 1e-3,
                               "schedule": {"type": "constant"}})
        assert isinstance(tx, optax.GradientTransformation)
        state = TrainState.create(model.apply, params, bs, tx)
        state, _ = make_train_step(model)(state, batch)
        return jax.tree_util.tree_leaves(state.params)

    ref = one_step(flat=False)
    flat = one_step(flat=True)
    for a, b in zip(ref, flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
