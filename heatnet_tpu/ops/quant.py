"""Post-training int8 calibration for the opt-in serving mode.

Workflow (see models/layers.Int8Conv for the quantization scheme and the
measured reasoning):

    os.environ["HEATNET_QUANT"] = "int8"   # before model construction
    model = ResNeXtSeg(...)
    variables = {"params": ..., "batch_stats": ...}      # bf16-trained
    variables = calibrate_int8(model.apply, variables, calib_batches)
    out = model.apply(variables, *inputs)                # int8 serving

Calibration runs the model with the ``quant`` collection mutable; every
Int8Conv records a running max of its activation scale across the
calibration batches. The returned variables carry the static scales, so
serving applies are pure (no reductions added to the graph).

The reference has no quantization story (it serves fp32 torch,
scripts/inference.py:125-131); this is a TPU-era capability on top of
parity, kept strictly opt-in because the north-star mIoU contract is
defined at bf16.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Mapping, Sequence


def calibrate_int8(
    apply_fn: Callable,
    variables: Mapping[str, Any],
    batches: Iterable[Sequence[Any]],
    **apply_kwargs: Any,
):
    """Run calibration batches, returning variables with static scales.

    ``batches`` yields positional-argument tuples for ``apply_fn`` (e.g.
    ``(rgb, ir)`` pairs for the two-stream models). Scales accumulate as
    a running max across batches. Extra ``apply_kwargs`` are forwarded
    (e.g. ``train=False``).
    """
    import jax

    # jit the calibration step: an eager flax apply dispatches op-by-op
    # (minutes on CPU, >10 min through the TPU relay). One compile per
    # distinct batch shape.
    @jax.jit
    def _step(variables, batch):
        _, updated = apply_fn(variables, *batch, mutable=["quant"],
                              **apply_kwargs)
        if "quant" not in updated:
            raise ValueError(
                "model created no quant variables — was HEATNET_QUANT=int8 "
                "set before the model traced? (the flag is read at trace "
                "time; see models/layers.conv)")
        return updated["quant"]

    variables = dict(variables)
    saw_batch = False
    for batch in batches:
        saw_batch = True
        if not isinstance(batch, (tuple, list)):
            batch = (batch,)
        variables["quant"] = _step(variables, tuple(batch))
    if not saw_batch:
        raise ValueError("calibration saw no batches")
    return variables
