"""Op-level attribution + speed-of-light bound for the flagship graph.

Two independent measurements of the same batch-128 bf16 inference graph
that bench.py times end-to-end:

1. ``--sol``: the compiled executable's own cost model
   (``compiled.cost_analysis()``: FLOPs and bytes accessed post-fusion)
   against v5e peaks (197 TFLOP/s bf16 MXU, 819 GB/s HBM) — the
   compute-bound and bandwidth-bound floors for THIS compiled graph, vs
   the measured wall time. max(floors)/measured is the fraction of
   speed-of-light achieved.

2. ``--trace``: a ``jax.profiler`` device trace of a few iterations,
   parsed from the xplane proto (xprof is in the image): top device ops
   by self-time and totals bucketed by op category (convolution vs
   fusion/elementwise vs data formatting). Gated behind a flag because
   device tracing may be unsupported through the axon relay — the tool
   degrades to the cost-model path.

Run on the real chip:  python tools/profile_infer.py --sol [--trace]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_TFLOPS_BF16 = 197.0
V5E_HBM_GBS = 819.0
BATCH = 128


def build_infer():
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.core.cache import enable_compilation_cache
    from heatnet_tpu.models import ResNeXtSeg
    from heatnet_tpu.ops.preprocess import inference_preprocess

    enable_compilation_cache()
    model = ResNeXtSeg(structure=(3, 4, 6, 3), input_channels=4,
                       dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randint(0, 255, (BATCH, 320, 960, 3)), jnp.uint8)
    ir = jnp.asarray(rng.randint(21000, 26000, (BATCH, 320, 960, 1)),
                     jnp.uint16)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((BATCH, 320, 704, 3)), jnp.zeros((BATCH, 320, 704, 1)))

    @jax.jit
    def infer(rgb, ir):
        rgb_f, ir_f = inference_preprocess(rgb, ir)
        rgb_f = jnp.pad(rgb_f, ((0, 0), (0, 0), (2, 2), (0, 0)))
        ir_f = jnp.pad(ir_f, ((0, 0), (0, 0), (2, 2), (0, 0)))
        seg, _, _ = model.apply(variables, rgb_f, ir_f)
        return jnp.argmax(seg, axis=-1)

    return infer, rgb, ir


def measured_ms(infer, rgb, ir, warmup=4, chunks=4, iters=4):
    t_chunks = []
    for _ in range(warmup):
        infer(rgb, ir).block_until_ready()
    for _ in range(chunks):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(rgb, ir)
        out.block_until_ready()
        t_chunks.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(t_chunks))


def sol_report(infer, rgb, ir):
    lowered = infer.lower(rgb, ir)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0]
    flops = cost.get("flops", 0.0)
    bytes_acc = cost.get("bytes accessed", 0.0)
    t_flop_ms = flops / (V5E_PEAK_TFLOPS_BF16 * 1e12) * 1e3
    t_hbm_ms = bytes_acc / (V5E_HBM_GBS * 1e9) * 1e3
    ms = measured_ms(infer, rgb, ir)
    floor = max(t_flop_ms, t_hbm_ms)
    print(f"compiled-graph cost model (post-fusion, XLA's own accounting):")
    print(f"  flops/batch           {flops / 1e12:10.2f} TFLOP"
          f"  -> compute floor {t_flop_ms:7.1f} ms")
    print(f"  HBM bytes/batch       {bytes_acc / 1e9:10.2f} GB"
          f"     -> bandwidth floor {t_hbm_ms:5.1f} ms")
    print(f"  measured              {ms:10.1f} ms/batch"
          f" ({BATCH / ms * 1e3:.1f} fps)")
    print(f"  speed-of-light floor  {floor:10.1f} ms"
          f"  -> {floor / ms * 100:.0f}% of SOL achieved")
    bound = "compute (MXU)" if t_flop_ms > t_hbm_ms else "bandwidth (HBM)"
    print(f"  binding resource: {bound}")
    return ms


def parse_xplane(logdir, iters, top=25):
    """Parse the newest xplane proto under logdir: per-op and per-category
    device-time buckets. Returns (per_op, per_cat, total_us) or None."""
    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        print("no xplane trace emitted (device tracing unsupported here)")
        return None
    xplane_pb2 = None
    for modname in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                    "xprof.protobuf.xplane_pb2",
                    "tensorflow.core.profiler.protobuf.xplane_pb2"):
        try:
            import importlib
            xplane_pb2 = importlib.import_module(modname)
            break
        except Exception:
            continue
    if xplane_pb2 is None:
        print("no xplane proto parser importable")
        return None
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    per_op = collections.Counter()
    per_cat = collections.Counter()
    device_planes = [p for p in space.planes
                     if "TPU" in p.name or "/device:" in p.name]
    if not device_planes:
        print(f"planes in trace: {[p.name for p in space.planes]}")
        print("no device plane captured (relay does not expose device trace)")
        return None
    for plane in device_planes:
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                dur_us = ev.duration_ps / 1e6
                per_op[name] += dur_us
                cat = name.split(".")[0].split("(")[0]
                per_cat[cat] += dur_us
    total = sum(per_op.values())
    print(f"\ndevice trace: {total / 1e3:.1f} ms total over {iters} iters"
          f" ({total / iters / 1e3:.1f} ms/iter)")
    print(f"top {top} device ops by accumulated time:")
    for name, us in per_op.most_common(top):
        print(f"  {us / 1e3:9.2f} ms  {100 * us / total:5.1f}%  {name[:90]}")
    print("by category:")
    for cat, us in per_cat.most_common(15):
        print(f"  {us / 1e3:9.2f} ms  {100 * us / total:5.1f}%  {cat}")
    return per_op, per_cat, total


def trace_report(infer, rgb, ir, logdir="/tmp/heatnet_trace"):
    import jax

    for _ in range(2):
        infer(rgb, ir).block_until_ready()
    jax.profiler.start_trace(logdir)
    for _ in range(3):
        out = infer(rgb, ir)
    out.block_until_ready()
    jax.profiler.stop_trace()
    parse_xplane(logdir, iters=3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sol", action="store_true")
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()
    infer, rgb, ir = build_infer()
    if args.sol or not args.trace:
        sol_report(infer, rgb, ir)
    if args.trace:
        trace_report(infer, rgb, ir)


if __name__ == "__main__":
    main()
