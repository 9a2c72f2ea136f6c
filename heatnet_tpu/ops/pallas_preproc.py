"""Pallas TPU kernels: fused sensor-format → network-format preprocessing.

The hot ingest ops of the inference pipeline (BASELINE.json north star:
"fused jax.image/Pallas host-offload transforms"):

- ``ir_normalize_fused``: uint16 radiometric counts → bf16 in [-1, 1] in ONE
  VMEM pass (clamp to [21800, 25000], scale to [0,1], mean/std 0.5 —
  thermal_loader.py:648-659 + :727-728 fused).
- ``rgb_normalize_fused``: uint8 → bf16 in [-1, 1] (to_tensor + normalize
  fused, :711-728).

Kernels view the image as (rows, 128)-lane tiles (NHWC arrays here always
have 128-divisible pixel counts: 320·960·C). A ``pl.pallas_call`` grid
streams row-blocks HBM→VMEM→HBM with elementwise VPU math. Interpret mode
keeps the kernels testable on CPU.

**Measured verdict (v5e, bench.py)**: standalone these kernels run at HBM
speed (~0.03 ms for a batch-8 960x320 frame pair), but INSIDE the full
inference graph they are a net loss — 139.5 fps vs 162.1 fps at batch 8 —
because ``pallas_call`` is an opaque custom call XLA cannot fuse through,
so the normalized full-width tensor materializes in HBM instead of fusing
into the stem conv. The production ingest path therefore ships raw
uint8/uint16 to device and normalizes with plain jnp ops
(eval.validate._device_normalize); these kernels remain for standalone
host-offload use (e.g. normalizing frames outside a jit graph) and as the
template for kernels XLA genuinely can't fuse.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .preprocess import IR_MAXVAL, IR_MINVAL

_LANES = 128
_BLOCK_ROWS = 512


def _as_rows(x: jax.Array) -> Tuple[jax.Array, Tuple[int, ...], int]:
    """Flatten to (rows, 128), padding the tail row if needed."""
    shape = x.shape
    n = x.size
    rows = -(-n // _LANES)
    pad = rows * _LANES - n
    flat = x.reshape(-1)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), x.dtype)])
    return flat.reshape(rows, _LANES), shape, n


def _from_rows(y: jax.Array, shape: Tuple[int, ...], n: int) -> jax.Array:
    return y.reshape(-1)[:n].reshape(shape)


def _ir_kernel(ir_ref, out_ref):
    # Mosaic can't lower uint16->f32 directly; hop through int32
    x = ir_ref[:].astype(jnp.int32).astype(jnp.float32)
    x = jnp.clip(x, IR_MINVAL, IR_MAXVAL)
    x = (x - IR_MINVAL) / (IR_MAXVAL - IR_MINVAL)  # [0, 1]
    out_ref[:] = ((x - 0.5) / 0.5).astype(out_ref.dtype)  # [-1, 1]


def _rgb_kernel(rgb_ref, out_ref):
    x = rgb_ref[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    out_ref[:] = ((x - 0.5) / 0.5).astype(out_ref.dtype)


def _elementwise_call(kernel, x: jax.Array, out_dtype,
                      interpret: bool) -> jax.Array:
    rows2d, shape, n = _as_rows(x)
    rows = rows2d.shape[0]
    block = min(_BLOCK_ROWS, rows)
    grid = (pl.cdiv(rows, block),)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), out_dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((block, _LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block, _LANES), lambda i: (i, 0)),
        interpret=interpret,
    )(rows2d)
    return _from_rows(out, shape, n)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def ir_normalize_fused(ir_u16: jax.Array, out_dtype=jnp.bfloat16,
                       interpret: bool = False) -> jax.Array:
    """uint16 thermal → normalized out_dtype in [-1, 1], single fused pass."""
    return _elementwise_call(_ir_kernel, ir_u16, out_dtype, interpret)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def rgb_normalize_fused(rgb_u8: jax.Array, out_dtype=jnp.bfloat16,
                        interpret: bool = False) -> jax.Array:
    """uint8 RGB → normalized out_dtype in [-1, 1], single fused pass."""
    return _elementwise_call(_rgb_kernel, rgb_u8, out_dtype, interpret)


def inference_preprocess_fused(rgb_u8: jax.Array, ir_u16: jax.Array,
                               col_lo: int = 148, col_hi: int = 852,
                               out_dtype=jnp.bfloat16,
                               interpret: bool = None):
    """Full fused eval ingest: normalize (pallas) then window-crop.

    Drop-in faster variant of ``ops.preprocess.inference_preprocess`` for the
    eval/serving path (uses the stride-aligned 148:852 window). Normalization
    runs on the FULL frame (128-lane aligned) and the crop is a view-slice —
    cheaper than cropping first and losing lane alignment.
    """
    if interpret is None:
        interpret = not _on_tpu()
    rgb = rgb_normalize_fused(rgb_u8, out_dtype=out_dtype, interpret=interpret)
    ir = ir_normalize_fused(ir_u16, out_dtype=out_dtype, interpret=interpret)
    return rgb[:, :, col_lo:col_hi, :], ir[:, :, col_lo:col_hi, :]
