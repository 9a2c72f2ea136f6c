"""Train state: params + batch stats + optimizer state, mesh-aware.

Replaces the reference's implicit state bundle (model + optimizer +
lr_scheduler + epoch + best_iou, scripts/main.py:129-147 and
train_trgb_segnet_conf.py:276-283) with an explicit pytree that jitted step
functions thread through. BatchNorm running statistics live in
``batch_stats`` (flax convention) and are part of checkpoints.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct



class TrainState(struct.PyTreeNode):
    """Minimal functional train state (flax train_state + batch_stats)."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, apply_fn: Callable, params, batch_stats,
               tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )

    def apply_gradients(self, grads, new_batch_stats=None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(new_batch_stats
                         if new_batch_stats is not None else self.batch_stats),
            opt_state=new_opt_state,
        )

    @property
    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def init_model(model, rng: jax.Array, *example_inputs,
               init_kwargs: Optional[dict] = None):
    """Jitted model init → (params, batch_stats).

    NOTE: always init under jit. Un-jitted flax init dispatches each op
    separately — through the TPU relay of this image that is minutes instead
    of seconds (observed during verification).
    """
    init_kwargs = init_kwargs or {}

    def _init(rng, *inputs):
        return model.init({"params": rng}, *inputs, **init_kwargs)

    variables = jax.jit(_init)(rng, *example_inputs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    return params, batch_stats
