"""CycleGAN + uncertainty trainer tests (tiny models, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from heatnet_tpu.models import Discriminator, Generator, ResNeXtSeg
from heatnet_tpu.models.segnetsplit import ResNeXtDecoder, ResNeXtEncoder
from heatnet_tpu.train.cyclegan import (CycleGANState, ReplayBuffer,
                                        make_cyclegan_steps)
from heatnet_tpu.train.state import init_model
from heatnet_tpu.train.uncertainty import UncertaintyState, make_uncertainty_step


def test_replay_buffer_semantics():
    buf = ReplayBuffer(max_size=4, seed=0)
    first = buf.push_and_pop(np.arange(4, dtype=np.float32).reshape(4, 1))
    np.testing.assert_array_equal(first[:, 0], [0, 1, 2, 3])  # fills through
    out = buf.push_and_pop(np.full((4, 1), 9.0, np.float32))
    # once full: each element either passes through (9) or swaps an old one
    assert set(np.unique(out)).issubset({0.0, 1.0, 2.0, 3.0, 9.0})
    assert len(buf.data) == 4


def test_cyclegan_three_step_training():
    gen_a2b = Generator(output_nc=1, n_residual_blocks=1)
    gen_b2a = Generator(output_nc=1, n_residual_blocks=1)
    disc_a, disc_b = Discriminator(), Discriminator()
    seg_net = ResNeXtSeg(structure=(1, 1, 1, 1), input_channels=1, classes=13)

    rng = np.random.RandomState(0)
    batch = {
        "A": jnp.asarray(rng.rand(2, 64, 64, 1) * 2 - 1, jnp.float32),
        "B": jnp.asarray(rng.rand(2, 64, 64, 1) * 2 - 1, jnp.float32),
        "label": jnp.asarray(rng.randint(0, 13, (2, 64, 64))),
    }

    key = jax.random.PRNGKey(0)
    g_params = {
        "netG_A2B": gen_a2b.init({"params": key}, batch["A"])["params"],
        "netG_B2A": gen_b2a.init({"params": key}, batch["B"])["params"],
    }
    seg_vars = seg_net.init({"params": key}, batch["A"], None, train=True)
    g_params["netSeg"] = seg_vars["params"]
    d_a_params = disc_a.init({"params": key}, batch["A"], None)["params"]
    d_b_params = disc_b.init({"params": key}, batch["B"], None)["params"]

    adam = optax.adam(2e-4, b1=0.5, b2=0.999)
    state = CycleGANState.create(g_params, seg_vars.get("batch_stats"),
                                 d_a_params, d_b_params, adam, adam)

    g_step, d_a_step, d_b_step = make_cyclegan_steps(
        gen_a2b, gen_b2a, disc_a, disc_b, seg_net)

    buf_a, buf_b = ReplayBuffer(), ReplayBuffer()
    state, fake_a, fake_b, metrics = g_step(state, batch)
    for k in ("loss_G", "loss_G_identity", "loss_G_GAN", "loss_G_cycle",
              "loss_segmentation_A"):
        assert np.isfinite(float(metrics[k])), k
    assert fake_a.shape == batch["A"].shape

    fa = jnp.asarray(buf_a.push_and_pop(np.asarray(fake_a)))
    fb = jnp.asarray(buf_b.push_and_pop(np.asarray(fake_b)))
    state, loss_da = d_a_step(state, batch["A"], fa)
    state, loss_db = d_b_step(state, batch["B"], fb)
    assert np.isfinite(float(loss_da)) and np.isfinite(float(loss_db))

    # generator step must not touch discriminator params and vice versa
    state2, _, _, _ = g_step(state, batch)
    da_before = jax.tree_util.tree_leaves(state.d_a_params)[0]
    da_after = jax.tree_util.tree_leaves(state2.d_a_params)[0]
    np.testing.assert_array_equal(np.asarray(da_before), np.asarray(da_after))


def test_uncertainty_trainer_step():
    structure = (1, 1, 1, 1)
    enc1 = ResNeXtEncoder(structure=structure, in_channels=1, classes=12)
    enc2 = ResNeXtEncoder(structure=structure, in_channels=1, classes=1)
    seg_dec = ResNeXtDecoder(out_classes=12)
    unc_dec = ResNeXtDecoder(out_classes=1, last_activation="sigmoid")

    rng = np.random.RandomState(0)
    ir = jnp.asarray(rng.rand(2, 64, 64, 1), jnp.float32)
    label = jnp.asarray(rng.randint(0, 12, (2, 64, 64)))

    key = jax.random.PRNGKey(0)
    params, stats = {}, {}
    for name, mod, args in [("encoder1", enc1, (ir,)), ("encoder2", enc2, (ir,))]:
        v = mod.init({"params": key}, *args, train=True)
        params[name], stats[name] = v["params"], v.get("batch_stats")
    enc_out, out4 = enc1.apply({"params": params["encoder1"],
                                "batch_stats": stats["encoder1"]}, ir)
    enc_out2, out42 = enc2.apply({"params": params["encoder2"],
                                  "batch_stats": stats["encoder2"]}, ir)
    for name, mod, args in [("seg_decoder", seg_dec, (enc_out, out4)),
                            ("unc_decoder", unc_dec, (enc_out2, out42))]:
        v = mod.init({"params": key}, *args, train=True)
        params[name], stats[name] = v["params"], v.get("batch_stats")

    state = UncertaintyState.create(params, stats, optax.adam(1e-4, b1=0.5))
    step = make_uncertainty_step(enc1, enc2, seg_dec, unc_dec)
    state, metrics = step(state, {"ir": ir, "label": label})
    assert np.isfinite(float(metrics["Segmentation Loss"]))
    assert np.isfinite(float(metrics["Uncertainty Loss"]))
    assert int(state.step) == 1


def test_device_replay_buffer_semantics():
    """DeviceReplayBuffer matches the reference ReplayBuffer protocol
    (utils.py:92-112): pass-through while filling; once full, p=.5 swap
    with a random slot and emit the stored element."""
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.train.cyclegan import DeviceReplayBuffer

    buf = DeviceReplayBuffer.create(4, (2, 2, 1))
    push = jax.jit(lambda b, x, k: b.push_and_pop(x, k))

    # filling phase: always pass-through, size grows
    outs = []
    for i in range(4):
        x = jnp.full((1, 2, 2, 1), float(i))
        buf, out = push(buf, x, jax.random.PRNGKey(i))
        outs.append(float(out[0, 0, 0, 0]))
    assert outs == [0.0, 1.0, 2.0, 3.0]
    assert int(buf.size) == 4

    # full phase: output is either the new element or one of the stored
    got_old = got_new = False
    for i in range(40):
        x = jnp.full((1, 2, 2, 1), 100.0 + i)
        buf, out = push(buf, x, jax.random.PRNGKey(1000 + i))
        v = float(out[0, 0, 0, 0])
        if v == 100.0 + i:
            got_new = True
        else:
            got_old = True
        assert int(buf.size) == 4
    assert got_old and got_new  # both branches exercised
