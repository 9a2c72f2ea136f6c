"""Per-op latency roofline for the batch-1 serving graph (VERDICT r3
item 6 — makes the ~22 ms/frame number as defensible as the 447-fps one).

At batch 1 the flagship graph is a serial chain of ~300 fused ops whose
tensors are far too small to reach HBM bandwidth, so neither the MXU
floor (1.6 ms) nor the bandwidth floor (~2.3 ms) explains the measured
~22 ms. The honest model for a serial chain is per-op: each op costs at
least the chip's issue-to-retire latency for its size class,

    t_frame  >=  sum_ops max(op_overhead, op_bytes / BW_eff(size))

This tool measures the two unknowns ON THIS CHIP instead of assuming
them:

1. **Op-chain calibration**: scan-differenced chains of K dependent
   elementwise ops (y = y*c + d, bf16) at tensor sizes from 64 KiB to
   16 MiB. Dependent ops cannot overlap, exactly like the batch-1
   frame chain; the per-op time at each size gives the chip's serial
   op overhead (small sizes, flat region) and effective serial-chain
   bandwidth (large sizes, linear region).
2. **Graph statistics**: the compiled batch-1 graph's post-fusion HBM
   bytes + FLOPs (XLA cost model) and its device-op count (parsed from
   the xplane trace of 5 frames).

It prints the bracket [max(N*a, B/BW_peak, F/MXU),  N*a + B/BW_eff]
against the measured scan-differenced device ms. Measured/bracket ~ 1
means the chain runs at the chip's own serial-op speed and further
latency wins require FEWER ops (a different architecture), not better
scheduling — the same closing argument the throughput roofline makes.

MEASURED OUTCOME (2026-08-21): the chain calibration is a NEGATIVE
result as a bandwidth probe — at 64 KiB-16 MiB the whole carry lives in
VMEM across scan iterations, so mid-size deltas drown in relay noise
(negative us/op) and 16 MiB reports 1619 GB/s, far above HBM peak: the
synthetic chain never touches HBM the way the real graph does. What DID
crack batch-1 was the other half of this workflow: the per-op trace
parse found a single 13.76 ms kLoop fusion (the final ConvTranspose
scalarized with a size-1 lane dim), fixed by
models/layers.SubpixelConvTranspose — batch-1 24.1 -> 9.49 ms. The tool
is kept for the trace-side op census (`count_device_ops`) and as the
record of why "per-op overhead x op count" is not a valid TPU latency
model: serial cost is layout/lowering-dependent per op, not a constant.

Run on the real chip: python tools/bench_latency_roofline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_TFLOPS_BF16 = 197.0
V5E_HBM_GBS = 819.0


def calibrate_chain(size_bytes: int, n_small=64, n_large=1024):
    """ms per dependent elementwise op on a bf16 tensor of ``size_bytes``.

    One op = read + write of the tensor (2x size_bytes of traffic) plus
    the serial issue overhead; scan-differenced so dispatch constants
    cancel. The multiplier varies per step (XLA cannot fold the chain).
    """
    import jax
    import jax.numpy as jnp

    n = max(size_bytes // 2, 128)
    x0 = jnp.ones((n,), jnp.bfloat16)

    def timed(k):
        @jax.jit
        def run(x):
            def body(y, i):
                m = (1.0 + i * 1e-12).astype(jnp.bfloat16)
                return y * m + jnp.bfloat16(1e-6), None
            y, _ = jax.lax.scan(body, x, jnp.arange(k, dtype=jnp.float32))
            return y

        def fetch(out):
            np.asarray(jax.device_get(out)).ravel()[:1]

        fetch(run(x0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fetch(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(n_large) - timed(n_small)) / (n_large - n_small) * 1e3


def graph_stats():
    """(bytes, flops, measured device ms/frame) of the batch-1 graph."""
    import jax

    from bench_latency import build, device_ms

    infer, extra, rgb, ir = build()
    compiled = jax.jit(lambda r, i: infer(r, i)).lower(rgb, ir).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    ms = device_ms(infer, extra, rgb, ir)
    return cost.get("bytes accessed", 0.0), cost.get("flops", 0.0), ms


def count_device_ops(trace_dir="/tmp/heatnet_lat_trace"):
    """Device-op count per frame from an existing bench_latency --trace
    xplane (5 frames); falls back to None if no trace present."""
    import collections
    import glob
    import importlib

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        return None
    xplane_pb2 = None
    for mod in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "xprof.protobuf.xplane_pb2"):
        try:
            xplane_pb2 = importlib.import_module(mod)
            break
        except Exception:
            continue
    if xplane_pb2 is None:
        return None
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    n = 0
    skip = ("copy-start", "copy-done", "slice-start", "slice-done")
    for plane in space.planes:
        if not ("TPU" in plane.name or "/device:" in plane.name):
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        per = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                lhs = name.split(" = ")[0].lstrip("%")
                if lhs.startswith(skip) or name in ("0", "?"):
                    continue
                per[name] += 1
        n += sum(per.values())
    return n // 5 if n else None


def main():
    from heatnet_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    sizes = [64 << 10, 256 << 10, 1 << 20, 4 << 20, 16 << 20]
    calib = {}
    for s in sizes:
        calib[s] = calibrate_chain(s)
        bw = 2 * s / (calib[s] / 1e3) / 1e9
        print(f"chain op @ {s >> 10:6d} KiB: {calib[s] * 1e3:7.1f} us/op "
              f"({bw:6.1f} GB/s serial-chain effective)", flush=True)

    bts, flops, meas_ms = graph_stats()
    n_ops = count_device_ops()
    print(f"\nbatch-1 graph: {bts / 1e9:.3f} GB, {flops / 1e9:.1f} GFLOP, "
          f"measured {meas_ms:.2f} ms/frame, {n_ops} device ops/frame")

    a_min = calib[sizes[0]]  # flat-region per-op overhead
    # typical activation tensor in this graph is ~1-4 MiB at batch 1;
    # use the measured serial-chain bandwidth at 4 MiB as BW_eff
    bw_eff = 2 * (4 << 20) / (calib[4 << 20] / 1e3)
    lo = max((n_ops or 0) * a_min,
             bts / (V5E_HBM_GBS * 1e9) * 1e3,
             flops / (V5E_PEAK_TFLOPS_BF16 * 1e12) * 1e3)
    hi = (n_ops or 0) * a_min + bts / bw_eff * 1e3
    print(f"bracket: [{lo:.1f}, {hi:.1f}] ms; measured {meas_ms:.2f} "
          f"({meas_ms / lo:.2f}x lower bound, "
          f"{meas_ms / hi if hi else 0:.2f}x upper)")
    print(json.dumps({
        "measured_ms": round(meas_ms, 2),
        "n_ops": n_ops,
        "graph_gb": round(bts / 1e9, 3),
        "graph_gflop": round(flops / 1e9, 1),
        "op_overhead_us": round(a_min * 1e3, 1),
        "chain_bw_eff_gbs": round(bw_eff / 1e9, 1),
        "bracket_lo_ms": round(lo, 1),
        "bracket_hi_ms": round(hi, 1),
        "calib_us_per_op": {str(k >> 10): round(v * 1e3, 1)
                            for k, v in calib.items()},
    }))


if __name__ == "__main__":
    main()
