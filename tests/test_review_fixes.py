"""Regression tests for the round-2 code-review findings.

Each test pins a fixed behavior: torch-parity RMSprop epsilon placement,
BN-free models through the trainers, poly-LR past its horizon, exact
confusion counts beyond f32's 2^24 integer range, adapter-critic gradient
flow, reference-parity phase masks, and prefetch-thread shutdown on
abandoned iterators.
"""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


def test_rmsprop_matches_torch():
    """optax.rmsprop(eps_in_sqrt=False) must track torch.optim.RMSprop:
    denominator sqrt(nu) + eps, not sqrt(nu + eps) (optim.py:133)."""
    import torch

    from heatnet_tpu.train.optim import create_optimizer

    w0 = np.array([0.5, -0.3, 1e-4], np.float32)
    g = np.array([1e-4, 2e-4, -1e-4], np.float32)  # small grads: nu << 1e-7

    tx = create_optimizer({"type": "RMSprop", "learning_rate": 0.01,
                           "schedule": {"type": "constant"}})
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    wt = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.RMSprop([wt], lr=0.01, alpha=0.99, eps=1e-8)
    for _ in range(3):
        wt.grad = torch.tensor(g)
        opt.step()

    np.testing.assert_allclose(np.asarray(params["w"]),
                               wt.detach().numpy(), rtol=1e-5, atol=1e-7)


class _NoBNSeg(nn.Module):
    """BN-free model (the batch_stats=None trainer path)."""

    @nn.compact
    def __call__(self, x, modal_2=None, train=False):
        seg = nn.Conv(14, (1, 1))(x)
        return seg, [seg], None


def test_train_step_without_batch_stats():
    """mutable must be False (not []) when there are no batch stats —
    flax treats mutable=[] as 'return (out, {})' and the unpack crashed."""
    from heatnet_tpu.train.state import TrainState
    from heatnet_tpu.train.supervised import make_train_step

    model = _NoBNSeg()
    x = jnp.zeros((2, 8, 8, 3))
    params = model.init({"params": jax.random.PRNGKey(0)}, x)["params"]
    state = TrainState.create(model.apply, params, None, optax.sgd(0.1))
    step = make_train_step(model)
    batch = {"image": x, "label": jnp.zeros((2, 8, 8), jnp.int32)}
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_poly_lr_clamps_past_max_iter():
    from heatnet_tpu.train.optim import poly_lr

    sched = poly_lr(0.01, max_iter=10)
    assert float(sched(10)) == 0.0
    assert float(sched(15)) == 0.0  # was NaN: (-0.5)**0.9
    assert np.isfinite(float(sched(1_000_000)))


def test_confusion_matrix_exact_beyond_f32_range():
    """Counts above 2^24 in one cell must not saturate (ops/iou.py
    chunked int32 accumulation; f32 matmul alone loses x+1==x)."""
    from heatnet_tpu.ops.iou import confusion_matrix

    n = (1 << 24) + 4097  # one cell beyond f32's exact-integer range
    pred = jnp.zeros((n,), jnp.int32)
    target = jnp.zeros((n,), jnp.int32)
    conf = np.asarray(jax.jit(confusion_matrix, static_argnums=2)(
        pred, target, 3))
    assert conf[0, 0] == n, f"lost counts: {conf[0, 0]} != {n}"
    assert conf.sum() == n


def test_adapter_disc_sees_adapter_output():
    """Reference parity (conf_segnet.py:108-132): the adapter critic scores
    the adapter's OUTPUT, so the adapter receives gradient through it."""
    from heatnet_tpu.models import ConfSegnet

    model = ConfSegnet(disc_arch="resnet18", num_critics=2,
                       structure=(1, 1, 1, 1), input_adapter=True)
    rgb = jnp.ones((1, 64, 64, 3))
    ir = jnp.ones((1, 64, 64, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           [rgb, ir], [rgb, ir])

    def adapter_critic_score(params):
        out = model.apply({**variables, "params": params},
                          [rgb, ir], [rgb, ir])
        return jnp.sum(out["critics_a"][-1].astype(jnp.float32))

    grads = jax.grad(adapter_critic_score)(variables["params"])
    leaves = jax.tree_util.tree_leaves(grads["input_adapter_net"])
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves), \
        "adapter gets no gradient through its critic (scored raw input?)"


def test_phase_masks_keep_adapter_disc_trainable():
    """setPhase toggles only critics[*] and trgb_segnet — adapter_disc,
    input_adapter_net and downscale nets stay trainable in BOTH phases."""
    from heatnet_tpu.train.adversarial import (critic_phase_mask,
                                               seg_phase_mask)

    params = {"trgb_segnet": {"w": 0}, "critics_0": {"w": 0},
              "critics_1": {"w": 0}, "adapter_disc": {"w": 0},
              "input_adapter_net": {"w": 0}, "downscale_nets_0": {"w": 0}}
    seg = seg_phase_mask(params)
    assert not seg["critics_0"]["w"] and not seg["critics_1"]["w"]
    assert seg["trgb_segnet"]["w"]
    assert seg["adapter_disc"]["w"], "reference keeps adapter critic on"
    assert seg["input_adapter_net"]["w"] and seg["downscale_nets_0"]["w"]
    crit = critic_phase_mask(params)
    assert not crit["trgb_segnet"]["w"]
    assert all(crit[k]["w"] for k in params if k != "trgb_segnet")


def test_batch_iterator_thread_exits_on_abandonment():
    """Breaking out of the iterator mid-epoch must release the producer
    thread (it used to park in q.put forever on the bounded queue)."""
    from heatnet_tpu.data.loaders import batch_iterator

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": np.zeros((4,), np.float32)}

    before = {t.ident for t in threading.enumerate()}
    it = batch_iterator(DS(), batch_size=2, shuffle=False, prefetch=1)
    next(it)
    it.close()  # abandon mid-epoch (GeneratorExit -> finally -> stop.set())

    deadline = time.time() + 5.0
    while time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"producer thread leaked: {extra}"
