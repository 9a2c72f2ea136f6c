"""Per-stage bf16 roofline for the flagship inference graph (VERDICT r3
item 3 — the int8 table's twin).

For every stage of the batch-128 bf16 graph (stem, mod2..mod5, ASPP,
decoder) this measures the stage standalone AND computes its compiled
cost model (post-fusion FLOPs and HBM bytes from XLA's own accounting) →
per-stage compute floor (197 TFLOP/s), bandwidth floor (819 GB/s), and
the roofline bound max(floors). The composite bound Σ max(floors) against
the measured e2e batch time says how much structural headroom the graph
still has: measured/bound ≈ 1 means the remaining gap is hardware, not
graph shape.

Timing is pipelined per-call (``bench_int8_roofline._time``: 10 enqueued
applications, one block at the end). Two measurement caveats, both
learned the hard way:

- The scan-differenced method this tool first shipped with (fold each
  output back into a scanned input carry) measured the stem at 431 ms vs
  its known 16.5 ms: with the full (128,320,964,4) input as the carry,
  every iteration pays buffer copies of the carry instead of aliasing
  it, and the measurement is the copies, not the stage.
  Scan-differencing is for steps whose carry is the small train state;
  stage benches use the pipelined method.
- The pipelined per-call times still carry NON-OVERLAPPED relay dispatch
  per stage call: the 2026-08-19 run sums stages to 463 ms against the
  286 ms e2e batch — standalone stage times are upper bounds, useful for
  RANKING stages, not for absolute attribution (use
  tools/profile_infer.py --trace for that). The COST-MODEL columns
  (XLA's own post-fusion FLOPs/bytes) are exact per stage, and the
  decisive output is the composite-bound comparison: e2e 286 ms vs
  sum-of-stage-bounds 291.3 ms (0.98x — the e2e graph is AT its serial
  composite roofline; inter-stage prefetch overlap is how it slips just
  under a bound that double-counts boundary traffic) and vs the
  perfect-overlap floor sum(compute floors) = 247.8 ms (1.15x).

Run on the real chip:
    python tools/bench_bf16_roofline.py [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_TFLOPS_BF16 = 197.0
V5E_HBM_GBS = 819.0


def stage_time_ms(apply_fn, x):
    """ms/application, pipelined per-call; see module docstring."""
    import jax

    from bench_int8_roofline import _time

    return _time(jax.jit(apply_fn), x)


def stage_cost(apply_fn, x):
    """(flops, bytes accessed) of ONE application, from XLA's cost model."""
    import jax

    compiled = jax.jit(apply_fn).lower(x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return cost.get("flops", 0.0), cost.get("bytes accessed", 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--stages",
                    default="stem,mod2,mod3,mod4,mod5,aspp,decoder")
    args = ap.parse_args()

    import jax

    from bench_int8_roofline import build_stage
    from heatnet_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    os.environ.pop("HEATNET_QUANT", None)

    rows = []
    for name in args.stages.split(","):
        mod, inputs = build_stage(name, args.batch)
        assert len(inputs) == 1
        x = inputs[0]
        variables = jax.jit(mod.init)({"params": jax.random.PRNGKey(0)}, x)

        def apply_fn(x, mod=mod, variables=variables):
            return mod.apply(variables, x)

        flops, bts = stage_cost(apply_fn, x)
        t_flop = flops / (V5E_PEAK_TFLOPS_BF16 * 1e12) * 1e3
        t_hbm = bts / (V5E_HBM_GBS * 1e9) * 1e3
        ms = stage_time_ms(apply_fn, x)
        bound = max(t_flop, t_hbm)
        rows.append((name, ms, t_flop, t_hbm, bound))
        print(f"  {name:8s} {ms:8.2f} ms   compute floor {t_flop:7.2f}  "
              f"HBM floor {t_hbm:7.2f}  -> bound {bound:7.2f}  "
              f"({ms / bound:4.2f}x, "
              f"{'MXU' if t_flop > t_hbm else 'HBM'}-bound)", flush=True)

    tot_ms = sum(r[1] for r in rows)
    tot_bound = sum(r[4] for r in rows)
    print(f"\n{'stage':8s} {'measured':>9s} {'MXU floor':>10s} "
          f"{'HBM floor':>10s} {'bound':>8s} {'x-of-bound':>10s}")
    for name, ms, tf, th, bd in rows:
        print(f"{name:8s} {ms:9.2f} {tf:10.2f} {th:10.2f} {bd:8.2f} "
              f"{ms / bd:10.2f}")
    print(f"{'SUM':8s} {tot_ms:9.2f} {'':10s} {'':10s} {tot_bound:8.2f} "
          f"{tot_ms / tot_bound:10.2f}")
    print(json.dumps({
        "batch": args.batch,
        "stage_sum_ms": round(tot_ms, 2),
        "composite_bound_ms": round(tot_bound, 2),
        "sum_compute_floor_ms": round(sum(r[2] for r in rows), 2),
        "sum_hbm_floor_ms": round(sum(r[3] for r in rows), 2),
        "x_of_bound": round(tot_ms / tot_bound, 3),
        "stages": {r[0]: {"ms": round(r[1], 2), "bound": round(r[4], 2)}
                   for r in rows},
    }))


if __name__ == "__main__":
    main()
