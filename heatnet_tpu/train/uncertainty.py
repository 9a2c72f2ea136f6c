"""IR seg + uncertainty pretrainer (dual encoder/decoder).

Reference: ``train_ir_uncertainty.py:101-226`` — two ResNeXtEncoders
(structure [2,2,2,2], 1-channel IR input) + a 12-class seg decoder and a
sigmoid uncertainty decoder regressing the per-pixel CE loss
(``uncertainty_gt = CE(reduce=False)``, :181-187); joint Adam(0.5, 0.999)
with CycleGAN LambdaLR decay; inputs subsampled 4x (:168-170).

Note: the reference's two backward calls (seg then uncertainty, :186-190)
sum gradients on the shared graph — but the graphs are disjoint (separate
encoders/decoders), and the uncertainty target is detached semantics in
intent; here the uncertainty GT uses ``stop_gradient`` and one total loss.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .supervised import cross_entropy_ignore


class UncertaintyState(struct.PyTreeNode):
    step: jax.Array
    params: Any  # {encoder1, encoder2, seg_decoder, unc_decoder}
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(jnp.zeros((), jnp.int32), params, batch_stats,
                   tx.init(params), tx)


def make_uncertainty_step(encoder1, encoder2, seg_decoder, unc_decoder):
    """Jitted joint step: (state, {ir, label}) → (state, metrics)."""

    def apply_mod(mod, params, stats, *args):
        variables = {"params": params}
        mutable = False
        if stats is not None:
            variables["batch_stats"] = stats
            mutable = ["batch_stats"]
        out = mod.apply(variables, *args, train=True, mutable=mutable)
        if mutable:
            return out[0], out[1].get("batch_stats")
        return out, None

    def loss_fn(params, batch_stats, batch):
        stats = batch_stats or {}
        ir, label = batch["ir"], batch["label"].astype(jnp.int32)

        (enc1, out41), s1 = apply_mod(encoder1, params["encoder1"],
                                      stats.get("encoder1"), ir)
        (enc2, out42), s2 = apply_mod(encoder2, params["encoder2"],
                                      stats.get("encoder2"), ir)
        seg, s3 = apply_mod(seg_decoder, params["seg_decoder"],
                            stats.get("seg_decoder"), enc1, out41)
        unc, s4 = apply_mod(unc_decoder, params["unc_decoder"],
                            stats.get("unc_decoder"), enc2, out42)

        seg_loss = cross_entropy_ignore(seg, label, ignore_index=-1)
        unc_gt = jax.lax.stop_gradient(
            cross_entropy_ignore(seg, label, ignore_index=-1, reduce=False))
        unc_loss = jnp.mean((unc[..., 0] - unc_gt) ** 2)

        new_stats = {"encoder1": s1, "encoder2": s2,
                     "seg_decoder": s3, "unc_decoder": s4}
        if all(v is None for v in new_stats.values()):
            new_stats = None
        return seg_loss + unc_loss, (new_stats, seg_loss, unc_loss)

    @jax.jit
    def step(state: UncertaintyState, batch):
        (loss, (new_stats, seg_loss, unc_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats if new_stats is not None else state.batch_stats,
            opt_state=new_opt,
        ), {"Segmentation Loss": seg_loss, "Uncertainty Loss": unc_loss}

    return step
