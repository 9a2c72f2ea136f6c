"""Small-batch serving crossovers under the round-4 (subpixel) graphs.

VERDICT r4 Weak #4: the README int8 crossover table ("batch 1: 27.5 vs
35.4 ms -> serve bf16 below batch 8") was measured on the PRE-subpixel
graph whose batch-1 bf16 was 27.5 ms; the shipped graph serves 9.49 ms.
The int8 gate (HEATNET_INT8_MIN_BATCH=8) and the subpixel gate
(HEATNET_SUBPIXEL_MAX_BATCH=8, exclusive) now coincide by accident, and
nothing measured int8 x subpixel. This tool re-derives both gates from
the CURRENT graphs: for each batch it measures all four dispatch corners

    bf16 x {subpixel, lhs-dilated}   int8 x {subpixel, lhs-dilated}

(gates forced via their env knobs so every corner is measurable at every
batch), plus the batch-1 barrier question from round-4 ADVICE: whether
``HEATNET_ARGMAX_BARRIER`` still changes the subpixel graph (it guarded
the lhs-dilated deconv against a kLoop argmax fusion; if the subpixel
graph measures the same with and without, the bench default flips off so
the benched graph IS the user's apply+argmax graph).

Timing: ``pipelined_ms`` (K frames in flight — amortizes the ~24 ms axon
relay round-trip; both sides of every comparison use the same method) for
the sweep; the chosen gate points are confirmed with scan-differenced
``device_ms`` at batch 1 and 8.

Run on the real chip:
    python tools/bench_small_batch_crossover.py [batches ...]

Measured results land in README's int8 crossover section.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(batch: int, quant: bool, subpixel: bool, barrier: bool = False):
    """One dispatch corner, gates forced via env; returns (infer, rgb, ir)."""
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.models import ResNeXtSeg
    from heatnet_tpu.ops.preprocess import inference_preprocess
    from heatnet_tpu.ops.quant import calibrate_int8

    os.environ["HEATNET_SUBPIXEL_MAX_BATCH"] = "100000" if subpixel else "0"
    if quant:
        os.environ["HEATNET_QUANT"] = "int8"
        os.environ["HEATNET_INT8_MIN_BATCH"] = "1"
    else:
        os.environ.pop("HEATNET_QUANT", None)

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
        pad = ((0, 0), (0, 0), (2, 2), (0, 0))
        return jnp.pad(rgb_f, pad), jnp.pad(ir_f, pad)

    if quant:
        variables = calibrate_int8(model.apply, dict(variables),
                                   [jax.jit(prep)(rgb, ir)])

    @jax.jit
    def infer(rgb, ir):
        rgb_f, ir_f = prep(rgb, ir)
        seg, _, _ = model.apply(variables, rgb_f, ir_f)
        if barrier:
            seg = jax.lax.optimization_barrier(seg)
        return jnp.argmax(seg, axis=-1).astype(jnp.uint8)

    return infer, rgb, ir


def pipelined_ms(infer, rgb, ir, depth=4, iters=40):
    import jax

    for _ in range(5):
        out = infer(rgb, ir)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for _ in range(iters):
        outs.append(infer(rgb, ir))
        if len(outs) > depth:
            jax.block_until_ready(outs.pop(0))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    from heatnet_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16]

    corners = [("bf16_subpix", False, True), ("bf16_lhs", False, False),
               ("int8_subpix", True, True), ("int8_lhs", True, False)]
    results = {}
    for b in batches:
        row = {}
        for name, quant, subpix in corners:
            try:
                infer, rgb, ir = build(b, quant, subpix)
                row[name] = round(pipelined_ms(infer, rgb, ir), 2)
            except Exception as e:
                row[name] = f"error: {repr(e)[:120]}"
            print(f"batch {b:3d} {name:12s} {row[name]}", flush=True)
        results[b] = row

    # barrier question at batch 1, subpixel graph (ADVICE r4)
    infer_nb, rgb, ir = build(1, False, True, barrier=False)
    infer_wb, _, _ = build(1, False, True, barrier=True)
    results["b1_barrier"] = {
        "subpix_no_barrier": round(pipelined_ms(infer_nb, rgb, ir), 2),
        "subpix_barrier": round(pipelined_ms(infer_wb, rgb, ir), 2)}
    print("b1_barrier", json.dumps(results["b1_barrier"]), flush=True)

    # scan-differenced confirmation at the gate points (device time)
    from bench_latency import device_ms as scan_device_ms

    for b in (1, 8):
        for name, quant, subpix in corners:
            try:
                infer, rgb, ir = build(b, quant, subpix)
                key = f"scan_b{b}_{name}"
                results[key] = round(scan_device_ms(infer, (), rgb, ir), 2)
                print(key, results[key], flush=True)
            except Exception as e:
                print(f"scan_b{b}_{name} error {repr(e)[:120]}", flush=True)

    print("FINAL", json.dumps(results))


if __name__ == "__main__":
    main()
