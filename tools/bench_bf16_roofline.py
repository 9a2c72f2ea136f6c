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

Timing is scan-differenced (the bench_train_step.py method — the only
timing the axon relay can't distort): N applications inside one jitted
``lax.scan`` with the input perturbed per iteration and the output summed
back into the carry (one extra output+input elementwise pass per iter,
<2% bias at these stage sizes, noted here once), two scan lengths
differenced so dispatch constants cancel.

Run on the real chip:
    python tools/bench_bf16_roofline.py [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_PEAK_TFLOPS_BF16 = 197.0
V5E_HBM_GBS = 819.0


def scan_time_ms(apply_fn, x, n_small=2, n_large=10):
    """ms/application via scan-differencing; see module docstring."""
    import jax
    import jax.numpy as jnp

    def step(carry, i):
        y = apply_fn(carry + i * jnp.asarray(1e-9, carry.dtype))
        leaves = [l for l in jax.tree_util.tree_leaves(y)
                  if hasattr(l, "dtype")]
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return carry + (s * 1e-30).astype(carry.dtype), None

    def timed(n):
        @jax.jit
        def run(x):
            out, _ = jax.lax.scan(step, x,
                                  jnp.arange(n, dtype=jnp.float32))
            return out

        def fetch(out):
            np.asarray(jax.device_get(out)).ravel()[:1]

        fetch(run(x))
        t0 = time.perf_counter()
        fetch(run(x))
        return time.perf_counter() - t0

    return (timed(n_large) - timed(n_small)) / (n_large - n_small) * 1e3


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
        ms = scan_time_ms(apply_fn, x)
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
        "x_of_bound": round(tot_ms / tot_bound, 3),
        "stages": {r[0]: {"ms": round(r[1], 2), "bound": round(r[4], 2)}
                   for r in rows},
    }))


if __name__ == "__main__":
    main()
