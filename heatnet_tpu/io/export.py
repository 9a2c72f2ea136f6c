"""AOT model export: serialized StableHLO serving artifacts.

The reference has no deployment story — serving is "load the torch
checkpoint in Python and call the module" (scripts/inference.py:91-143).
This module gives heatnet_tpu a production one built on ``jax.export``:

- :func:`export_inference` lowers the full inference function — on-device
  uint8/uint16 normalization + model forward + argmax — to StableHLO with
  the weights baked in, for BOTH cpu and tpu partitions by default
  (cross-platform lowering; no TPU needed at export time), with a
  **symbolic batch dimension** so one artifact serves any batch size.
- :func:`load_exported` deserializes the artifact and returns a callable;
  the artifact is self-contained (no model code, flax, or checkpoint
  needed at serving time — just jax).

Versioning/compat is delegated to jax.export's calling-convention
guarantees (artifacts record their serialization version).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export


def _seg_only(out):
    """Models return (seg, taps, cert) (trgb_segnet.py:399-402); serving
    wants the class map."""
    return out[0] if isinstance(out, tuple) else out


def export_inference(
    model,
    variables,
    input_shapes: Sequence[Tuple[int, ...]],
    input_dtypes: Optional[Sequence] = None,
    *,
    platforms: Sequence[str] = ("cpu", "tpu"),
    symbolic_batch: bool = True,
    normalize: bool = False,
    argmax: bool = True,
) -> bytes:
    """Serialize ``model.apply(variables, *inputs)`` to a serving artifact.

    ``input_shapes`` are per-input ``(batch, H, W, C)``; with
    ``symbolic_batch`` the batch entry is replaced by one shared symbolic
    dimension ``b`` (any batch size at serving time). ``normalize=True``
    prepends the raw-sensor-dtype normalization (uint8 RGB / uint16 IR →
    [-1, 1], the eval-loader convention), so the artifact consumes camera
    bytes directly. ``argmax=True`` returns the int32 class map instead of
    logits.
    """
    if input_dtypes is None:
        input_dtypes = [jnp.float32] * len(input_shapes)

    scope = jax_export.SymbolicScope()
    specs = []
    for shape, dtype in zip(input_shapes, input_dtypes):
        if symbolic_batch:
            (b,) = jax_export.symbolic_shape("b", scope=scope)
            shape = (b,) + tuple(shape[1:])
        specs.append(jax.ShapeDtypeStruct(shape, dtype))

    def serve(*inputs):
        if normalize:
            from ..eval.validate import _device_normalize

            inputs = tuple(_device_normalize(x) for x in inputs)
        out = _seg_only(model.apply(variables, *inputs, train=False))
        if argmax:
            return jnp.argmax(out, axis=-1).astype(jnp.int32)
        return out

    exported = jax_export.export(jax.jit(serve), platforms=list(platforms))(
        *specs)
    return exported.serialize()


def save_exported(path: str, artifact: bytes) -> None:
    with open(path, "wb") as f:
        f.write(artifact)


def load_exported(path: str) -> Callable:
    """Load a serving artifact; returns a jit-compatible callable.

    The callable re-traces through the embedded StableHLO on first use
    (per shape) — wrap in ``jax.jit`` once and reuse.
    """
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call


def exported_info(path: str) -> dict:
    """Human-readable artifact summary (shapes, platforms, sizes)."""
    import os

    with open(path, "rb") as f:
        data = f.read()
    exported = jax_export.deserialize(data)
    return {
        "fn_name": exported.fun_name,
        "platforms": list(exported.platforms),
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "calling_convention_version": exported.calling_convention_version,
        "bytes": os.path.getsize(path) if os.path.exists(path) else len(data),
    }
