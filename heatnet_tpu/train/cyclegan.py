"""CycleGAN day↔night IR translation trainer with joint segmentation.

Reference: ``/root/reference/models/cyclegan/train.py:87-320`` — two
Generators, two Discriminators + a jointly-trained ``netSeg``; losses
identity(x5) + GAN + cycle(x10) + seg CE on real_A and fake_B; per-net Adam
(0.5, 0.999); ``ReplayBuffer`` feeding the discriminators; linear LR decay.
(The reference imports a ``ResNeXt`` that does not exist in
cyclegan/models.py — SURVEY §7 known defects; here netSeg is our ResNeXtSeg.)

TPU-native: three jitted steps (generator, D_A, D_B) over a functional state;
the replay buffer stays host-side between steps (it is inherently stateful
sampling, cheap, and feeds the next jitted call).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .supervised import cross_entropy_ignore


class ReplayBuffer:
    """History buffer for discriminator inputs (utils.py:92-112)."""

    def __init__(self, max_size: int = 50, seed: int = 0):
        assert max_size > 0
        self.max_size = max_size
        self.data = []
        self._rng = np.random.RandomState(seed)

    def push_and_pop(self, batch: np.ndarray) -> np.ndarray:
        out = []
        for element in np.asarray(batch):
            element = element[None]
            if len(self.data) < self.max_size:
                self.data.append(element)
                out.append(element)
            elif self._rng.uniform() > 0.5:
                i = self._rng.randint(0, self.max_size)
                out.append(self.data[i].copy())
                self.data[i] = element
            else:
                out.append(element)
        return np.concatenate(out, axis=0)


class DeviceReplayBuffer(struct.PyTreeNode):
    """ReplayBuffer (utils.py:92-112) living on device, fully jittable.

    The host buffer forces one ``device_get`` per generator step to feed the
    discriminators — through the remote-dispatch relay that is ~25 ms per
    sync. This version keeps the history as a device array and threads a
    PRNG key; semantics match the reference: while not full, append and
    pass through; once full, with p=0.5 swap a random slot and emit the old
    element, else pass through.
    """

    data: jax.Array  # (max_size, H, W, C)
    size: jax.Array  # ()

    @classmethod
    def create(cls, max_size: int, item_shape, dtype=jnp.float32):
        return cls(data=jnp.zeros((max_size, *item_shape), dtype),
                   size=jnp.zeros((), jnp.int32))

    def push_and_pop(self, batch: jax.Array, key: jax.Array):
        """batch (B, H, W, C) → (new_buffer, out (B, H, W, C))."""
        max_size = self.data.shape[0]

        def one(carry, inp):
            data, size = carry
            element, k = inp
            k1, k2 = jax.random.split(k)
            not_full = size < max_size
            idx_new = jnp.minimum(size, max_size - 1)
            swap = jax.random.uniform(k1) > 0.5
            idx_old = jax.random.randint(k2, (), 0, max_size)
            idx = jnp.where(not_full, idx_new, jnp.where(swap, idx_old, 0))
            old = data[idx]
            do_store = not_full | swap
            data = jnp.where(do_store, data.at[idx].set(element), data)
            out = jnp.where(not_full | ~swap, element, old)
            return (data, jnp.minimum(size + 1, max_size)), out

        keys = jax.random.split(key, batch.shape[0])
        (data, size), out = jax.lax.scan(
            one, (self.data, self.size), (batch.astype(self.data.dtype), keys))
        return DeviceReplayBuffer(data=data, size=size), out


class CycleGANState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any          # {netG_A2B, netG_B2A, netSeg(+stats separate)}
    seg_batch_stats: Any
    d_a_params: Any
    d_b_params: Any
    g_opt: Any
    d_a_opt: Any
    d_b_opt: Any
    g_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    d_tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, g_params, seg_batch_stats, d_a_params, d_b_params,
               g_tx, d_tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            seg_batch_stats=seg_batch_stats,
            d_a_params=d_a_params,
            d_b_params=d_b_params,
            g_opt=g_tx.init(g_params),
            d_a_opt=d_tx.init(d_a_params),
            d_b_opt=d_tx.init(d_b_params),
            g_tx=g_tx,
            d_tx=d_tx,
        )


def make_cyclegan_steps(gen_a2b, gen_b2a, disc_a, disc_b, seg_net):
    """Build (g_step, d_a_step, d_b_step), all jitted.

    ``batch``: dict with A (day IR), B (night IR), label (day labels).
    g_step also returns (fake_A, fake_B) for the host replay buffers.
    """

    def mse(x, t):
        return jnp.mean((x.astype(jnp.float32) - t) ** 2)

    def l1(x, y):
        return jnp.mean(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))

    def seg_apply(params, stats, x, train):
        variables = {"params": params}
        mutable = False
        if stats is not None:
            variables["batch_stats"] = stats
            mutable = ["batch_stats"]
        out = seg_net.apply(variables, x, None, train=train, mutable=mutable)
        if mutable:
            (seg, _, _), new_vars = out
            return seg, new_vars.get("batch_stats")
        seg, _, _ = out
        return seg, None

    def g_loss_fn(g_params, seg_stats, d_a_params, d_b_params, batch):
        real_a, real_b = batch["A"], batch["B"]
        label_a = batch["label"].astype(jnp.int32)

        same_b = gen_a2b.apply({"params": g_params["netG_A2B"]}, real_b)
        loss_identity_b = l1(same_b, real_b) * 5.0
        same_a = gen_b2a.apply({"params": g_params["netG_B2A"]}, real_a)
        loss_identity_a = l1(same_a, real_a) * 5.0

        fake_b = gen_a2b.apply({"params": g_params["netG_A2B"]}, real_a)
        pred_fake_b = disc_b.apply({"params": d_b_params}, fake_b, None)
        loss_gan_a2b = mse(pred_fake_b, 1.0)

        fake_a = gen_b2a.apply({"params": g_params["netG_B2A"]}, real_b)
        pred_fake_a = disc_a.apply({"params": d_a_params}, fake_a, None)
        loss_gan_b2a = mse(pred_fake_a, 1.0)

        recovered_a = gen_b2a.apply({"params": g_params["netG_B2A"]}, fake_b)
        loss_cycle_aba = l1(recovered_a, real_a) * 10.0
        recovered_b = gen_a2b.apply({"params": g_params["netG_A2B"]}, fake_a)
        loss_cycle_bab = l1(recovered_b, real_b) * 10.0

        seg_a, new_stats = seg_apply(g_params["netSeg"], seg_stats, real_a, True)
        seg_fake_b, new_stats = seg_apply(g_params["netSeg"], new_stats,
                                          fake_b, True)
        loss_seg_a = cross_entropy_ignore(seg_a, label_a, ignore_index=-1)
        loss_seg_fake_b = cross_entropy_ignore(seg_fake_b, label_a,
                                               ignore_index=-1)

        loss_g = (loss_identity_a + loss_identity_b + loss_gan_a2b +
                  loss_gan_b2a + loss_cycle_aba + loss_cycle_bab +
                  loss_seg_a + loss_seg_fake_b)
        metrics = {
            "loss_G": loss_g,
            "loss_G_identity": loss_identity_a + loss_identity_b,
            "loss_G_GAN": loss_gan_a2b + loss_gan_b2a,
            "loss_G_cycle": loss_cycle_aba + loss_cycle_bab,
            "loss_segmentation_A": loss_seg_a,
            "loss_segmentation_fake_A": loss_seg_fake_b,
        }
        return loss_g, (new_stats, fake_a, fake_b, metrics)

    @jax.jit
    def g_step(state: CycleGANState, batch):
        (loss, (new_stats, fake_a, fake_b, metrics)), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params, state.seg_batch_stats,
                                     state.d_a_params, state.d_b_params, batch)
        updates, new_opt = state.g_tx.update(grads, state.g_opt, state.g_params)
        new_params = optax.apply_updates(state.g_params, updates)
        state = state.replace(step=state.step + 1, g_params=new_params,
                              seg_batch_stats=new_stats, g_opt=new_opt)
        return state, fake_a, fake_b, metrics

    def d_loss_fn(d_params, disc, real, fake):
        loss_real = mse(disc.apply({"params": d_params}, real, None), 1.0)
        loss_fake = mse(disc.apply({"params": d_params}, fake, None), 0.0)
        return (loss_real + loss_fake) * 0.5

    @jax.jit
    def d_a_step(state: CycleGANState, real_a, fake_a):
        loss, grads = jax.value_and_grad(d_loss_fn)(
            state.d_a_params, disc_a, real_a, fake_a)
        updates, new_opt = state.d_tx.update(grads, state.d_a_opt,
                                             state.d_a_params)
        new_params = optax.apply_updates(state.d_a_params, updates)
        return state.replace(d_a_params=new_params, d_a_opt=new_opt), loss

    @jax.jit
    def d_b_step(state: CycleGANState, real_b, fake_b):
        loss, grads = jax.value_and_grad(d_loss_fn)(
            state.d_b_params, disc_b, real_b, fake_b)
        updates, new_opt = state.d_tx.update(grads, state.d_b_opt,
                                             state.d_b_params)
        new_params = optax.apply_updates(state.d_b_params, updates)
        return state.replace(d_b_params=new_params, d_b_opt=new_opt), loss

    return g_step, d_a_step, d_b_step
