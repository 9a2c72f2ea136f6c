"""Batch-1 serving latency for the flagship graph (VERDICT r3 item 4).

The robot-deployment operating point: ONE 320x960 uint8 RGB + uint16 IR
frame in, class map out (the reference times exactly this,
scripts/inference.py:125-131). Three numbers, separated because they
answer different questions:

- ``device_ms``: chip time per frame, scan-differenced (N dependent
  frames inside one jitted ``lax.scan``, two lengths differenced) — the
  latency a deployment with a LOCAL TPU sees. The axon harness adds a
  ~24 ms relay round-trip per host-observed call that no robot would pay;
  round-2's 24.9 ms "latency" was dominated by it.
- ``host_ms``: per-call host-observed latency THROUGH the relay
  (dispatch → result fetch), the honest number for this harness.
- ``pipelined_ms``: host-observed per-frame time with K frames in flight
  (the relay round-trip amortizes; a robot streaming frames gets this
  without batching).

Also sweeps the latency levers: banded dilated convs on/off (the banding
cost model is batch-independent, but at batch 1 the side-band slices are
launch-bound), and input buffer donation.

Run on the real chip:
    python tools/bench_latency.py [--trace]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(batch=1, donate=False):
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.core.cache import enable_compilation_cache
    from heatnet_tpu.models import ResNeXtSeg
    from heatnet_tpu.ops.preprocess import inference_preprocess

    enable_compilation_cache()
    model = ResNeXtSeg(structure=(3, 4, 6, 3), input_channels=4,
                       dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randint(0, 255, (batch, 320, 960, 3)), jnp.uint8)
    ir = jnp.asarray(rng.randint(21000, 26000, (batch, 320, 960, 1)),
                     jnp.uint16)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((batch, 320, 704, 3)), jnp.zeros((batch, 320, 704, 1)))

    def infer(rgb, ir):
        rgb_f, ir_f = inference_preprocess(rgb, ir)
        rgb_f = jnp.pad(rgb_f, ((0, 0), (0, 0), (2, 2), (0, 0)))
        ir_f = jnp.pad(ir_f, ((0, 0), (0, 0), (2, 2), (0, 0)))
        seg, _, _ = model.apply(variables, rgb_f, ir_f)
        return jnp.argmax(seg, axis=-1).astype(jnp.uint8)

    kw = {"donate_argnums": (0, 1)} if donate else {}
    return jax.jit(infer, **kw), rgb, ir


def device_ms(infer, rgb, ir, n_small=4, n_large=24):
    """Chip time per frame via scan-differencing: frame i+1's input
    depends on frame i's output (a serial chain, like a robot loop)."""
    import jax
    import jax.numpy as jnp

    def step(carry, _):
        rgb_c, ir_c = carry
        out = infer(rgb_c, ir_c)
        # thread the output back into the next frame's input: xor the raw
        # IR with the class map's LSB — a REAL serial dependence XLA can't
        # fold away (x*0 or min(u8,0) would constant-fold and let the scan
        # hoist/pipeline the frames), worth ±1 count of radiometric noise
        ir_n = ir_c ^ (out[..., None].astype(jnp.uint16) & 1)
        return (rgb_c, ir_n), None

    def timed(n):
        @jax.jit
        def run(rgb, ir):
            carry, _ = jax.lax.scan(step, (rgb, ir), None, length=n)
            return carry[1]

        def fetch(out):
            np.asarray(jax.device_get(out)).ravel()[:1]

        fetch(run(rgb, ir))
        t0 = time.perf_counter()
        fetch(run(rgb, ir))
        return time.perf_counter() - t0

    return (timed(n_large) - timed(n_small)) / (n_large - n_small) * 1e3


def host_ms(infer, rgb, ir, iters=30):
    import jax

    for _ in range(5):
        out = infer(rgb, ir)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(infer(rgb, ir))).ravel()[:1]
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def pipelined_ms(infer, rgb, ir, depth=4, iters=40):
    import jax

    for _ in range(5):
        out = infer(rgb, ir)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(infer(rgb, ir))
        if len(outs) > depth:
            jax.block_until_ready(outs.pop(0))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    results = {}
    for label, env in [("banded", None), ("monolithic",
                                          {"HEATNET_BANDED_DILATED": "off"})]:
        if env:
            os.environ.update(env)
        infer, rgb, ir = build()
        results[label] = {
            "device_ms": round(device_ms(infer, rgb, ir), 2),
            "host_ms": round(host_ms(infer, rgb, ir), 2),
            "pipelined_ms": round(pipelined_ms(infer, rgb, ir), 2),
        }
        print(label, json.dumps(results[label]), flush=True)
        if env:
            for k in env:
                os.environ.pop(k, None)

    if args.trace:
        import jax

        from profile_infer import parse_xplane

        infer, rgb, ir = build()
        for _ in range(3):
            out = infer(rgb, ir)
        jax.block_until_ready(out)
        logdir = "/tmp/heatnet_lat_trace"
        jax.profiler.start_trace(logdir)
        for _ in range(5):
            out = infer(rgb, ir)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        parse_xplane(logdir, iters=5, top=30)

    print("FINAL", json.dumps(results))


if __name__ == "__main__":
    main()
