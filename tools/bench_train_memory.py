"""Peak-HBM probe for the Vistas B=30 training scan graph (VERDICT r4
training-gap work).

Round-4 finding: the shipped `11cc` scan step compiles to temp_size
15.50 GB / peak 15.41 GB — flush against the v5e's 16 GB — so XLA spills
params/optimizer state to HOST memory, and the step's device trace shows
the Adam updates and data-grad fusions reading f32 kernels from S(1) at
10-50x their HBM floors (~130 ms of the 617 ms step). Timing sweeps are
expensive (~20 min/config); this tool compiles a config WITHOUT running
it and prints `compiled.memory_analysis()` peak/temp plus the cost-model
floors, so only peak-reducing configs graduate to a timed sweep.

Spec syntax matches tools/sweep_train_dispatch.py's env part:
``label=KEY:VAL,KEY:VAL`` (vistas B=30 scan graph, length 5, the same
graph tools/bench_train_step.py times).

Run on the real chip: python tools/bench_train_memory.py [specs...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

DEFAULT_SPECS = [
    "shipped=",
    "head=HEATNET_REMAT_HEAD:1",
    "mask111c=HEATNET_REMAT_STAGES:111c",
    "head_111c=HEATNET_REMAT_HEAD:1,HEATNET_REMAT_STAGES:111c",
]


def _child() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_train import build_vistas

    step, st, (vb,), probe = build_vistas(int(os.environ.get(
        "HEATNET_MEMBENCH_BATCH", "30")))

    def perturb(b, i):
        return {k: (v + i * 1e-9
                    if jnp.issubdtype(v.dtype, jnp.floating) else v)
                for k, v in b.items()}

    def body(s, i):
        out = step(s, perturb(vb, i))
        return (out[0] if isinstance(out, tuple) else out), None

    @jax.jit
    def run(s):
        s2, _ = jax.lax.scan(body, s, jnp.arange(5, dtype=jnp.float32))
        return probe(s2)

    c = run.lower(st).compile()
    m = c.memory_analysis()
    cost = c.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    print(json.dumps({
        "peak_gb": round(m.peak_memory_in_bytes / 1e9, 3),
        "temp_gb": round(m.temp_size_in_bytes / 1e9, 3),
        "arg_gb": round(m.argument_size_in_bytes / 1e9, 3),
        "flops_T_per_iter": round(cost.get("flops", 0.0) / 5e12, 2),
        "hbm_gb_per_iter": round(cost.get("bytes accessed", 0.0) / 5e9, 2),
    }))


def main() -> None:
    if os.environ.get("_HEATNET_MEMBENCH_CHILD"):
        _child()
        return
    specs = sys.argv[1:] or DEFAULT_SPECS
    here = os.path.abspath(__file__)
    repo_root = os.path.dirname(os.path.dirname(here))
    results = {}
    for spec in specs:
        label, _, env_part = spec.partition("=")
        env = dict(os.environ, _HEATNET_MEMBENCH_CHILD="1")
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        if env_part:
            for kv in env_part.split(","):
                k, v = kv.split(":", 1)
                env[k] = v
        proc = subprocess.run([sys.executable, here], env=env,
                              capture_output=True, text=True, timeout=3600)
        lines = [l for l in proc.stdout.strip().splitlines()
                 if l.startswith("{")]
        results[label] = (json.loads(lines[-1]) if lines
                          else {"error": proc.stderr[-300:]})
        print(label, json.dumps(results[label]), flush=True)
    print("FINAL", json.dumps(results))


if __name__ == "__main__":
    main()
