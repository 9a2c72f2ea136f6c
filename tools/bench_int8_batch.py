"""Probe the int8 serving throughput at batches past the bf16 sweet spot.

bf16 peaks at batch 128 (415 fps) with an immediate cliff above (374 @192,
356 @256 — README). int8 cuts MXU time ~1.21x and shrinks no activation
bytes (accumulators are int32), so the question is empirical: does the
HBM cliff sit at the same batch, or does the changed compute/memory ratio
move the int8 peak? Run on the real chip:

    python tools/bench_int8_batch.py 128 192 256

MEASURED (v5e, 2026-08-18): batch 144 → RESOURCE_EXHAUSTED; batches
192/256 → TPU compile-helper failure during allocation. The int8 graph's
int32 accumulators push HBM past capacity immediately above 128 — batch
128 is the int8 ceiling as well as its sweet spot, and 502 fps stands as
the serving roofline for this graph (per-stage attribution in README).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WARMUP = 3
CHUNKS = 4
CHUNK_ITERS = 4


def bench_batch(batch: int) -> float:
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.models import ResNeXtSeg
    from heatnet_tpu.ops.preprocess import inference_preprocess
    from heatnet_tpu.ops.quant import calibrate_int8

    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randint(0, 255, (batch, 320, 960, 3)), jnp.uint8)
    ir = jnp.asarray(rng.randint(21000, 26000, (batch, 320, 960, 1)),
                     jnp.uint16)

    model = ResNeXtSeg(structure=(3, 4, 6, 3), input_channels=4,
                       dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((batch, 320, 704, 3)), jnp.zeros((batch, 320, 704, 1)))

    def prep(rgb, ir):
        rgb_f, ir_f = inference_preprocess(rgb, ir)
        rgb_f = jnp.pad(rgb_f, ((0, 0), (0, 0), (2, 2), (0, 0)))
        ir_f = jnp.pad(ir_f, ((0, 0), (0, 0), (2, 2), (0, 0)))
        return rgb_f, ir_f

    qvars = calibrate_int8(model.apply, dict(variables),
                           [jax.jit(prep)(rgb, ir)])

    @jax.jit
    def infer_q(rgb, ir):
        rgb_f, ir_f = prep(rgb, ir)
        seg, _, _ = model.apply(qvars, rgb_f, ir_f)
        return jnp.argmax(seg, axis=-1)

    for _ in range(WARMUP):
        out = infer_q(rgb, ir)
    out.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(CHUNKS):
        for _ in range(CHUNK_ITERS):
            out = infer_q(rgb, ir)
        out.block_until_ready()
    return batch * CHUNKS * CHUNK_ITERS / (time.perf_counter() - t0)


def main() -> None:
    from heatnet_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    os.environ["HEATNET_QUANT"] = "int8"
    for arg in (sys.argv[1:] or ["128", "192", "256"]):
        b = int(arg)
        try:
            fps = bench_batch(b)
            print(json.dumps({"batch": b, "int8_fps": round(fps, 1)}))
        except Exception as e:
            print(json.dumps({"batch": b, "error": repr(e)[:200]}))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
