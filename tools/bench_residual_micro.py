"""Isolate the two biggest Vistas-step residuals: optimizer + BN reduces.

VERDICT r4 Weak #3: the round-4 per-op table (README "Training steps vs
their compiled floors") attributes ~85 ms/step to Adam/weight-finalization
fusions (~50x their ~3 ms byte floor) and ~87 ms to BN-backward
dgamma/dbeta reduces (~6x their ~15 ms byte floor), then claims both are
chip throughput, not graph shape — WITHOUT an isolated measurement of
either. This tool provides the missing microbenches, each scan-differenced
(tools/bench_train_step.py's method) on the real chip:

1. ``adam``: optimizer update ONLY, on the EXACT Vistas param tree
   (ResNeXt-50 seg, input_3x3, 14 classes — the tree bench_train_step.py's
   vistas config trains). Three variants:
   - ``tree``: optax.adam exactly as the trainer runs it;
   - ``flat``: optax.flatten(optax.adam) — ONE fused update over a single
     concatenated vector (the "flat-buffer optimizer" lever the round-4
     table never tried), paying concat/split of grads+updates per step;
   - ``preflat``: adam on a tree that IS one flat vector (concat/split
     amortized outside the step) — the floor if tree structure were free.
   If ``tree`` reproduces ~85 ms and ``flat``/``preflat`` don't beat it,
   the residual is chip throughput on 28*P update bytes; if they win big,
   the round-4 conclusion was wrong and the lever ships.

2. ``reduce``: dgamma/dbeta-style NHW->C reduces at the EXACT BN
   activation shapes of the Vistas B=30 step (captured from the model via
   ``capture_intermediates`` under ``jax.eval_shape`` — no hand-listed
   shapes). For each shape, computes sum(xhat*dy) and sum(dy) over NHW
   from bf16 inputs (the op class the trace bills ~87 ms for), reports
   measured ms vs the 819 GB/s byte floor, per shape and total. Shapes are
   benched in groups small enough to fit HBM alongside nothing else.

Run on the real chip:
    python tools/bench_residual_micro.py [adam|reduce|all] [--json]

Measured results are recorded in README next to the round-4 table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

V5E_HBM_GBS = 819.0
VISTAS_B = 30


def scan_timeit(step_into_state, state0, probe, n_small=1, n_large=9):
    """ms/step via scan-differencing (see bench_train_step.py for why)."""
    import jax
    import jax.numpy as jnp

    def timed(n):
        @jax.jit
        def run(state):
            st, _ = jax.lax.scan(
                lambda st, i: (step_into_state(st, i), None),
                state, jnp.arange(n, dtype=jnp.float32))
            return probe(st)

        def fetch(out):
            for leaf in jax.tree_util.tree_leaves(out):
                np.asarray(jax.device_get(leaf)).ravel()[:1]

        fetch(run(state0))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fetch(run(state0))
            best = min(best, time.perf_counter() - t0)
        return best

    for scale in (1, 3):
        n_hi = n_small + (n_large - n_small) * scale
        ms = (timed(n_hi) - timed(n_small)) / (n_hi - n_small) * 1e3
        if ms > 0.05:
            return ms
    return ms


def _vistas_params():
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.models import ResNeXtSeg
    from heatnet_tpu.train.state import init_model

    model = ResNeXtSeg(structure=(3, 4, 6, 3), input_channels=3,
                       classes=14, input_3x3=True, dtype=jnp.bfloat16,
                       remat=True)
    params, bs = init_model(model, jax.random.PRNGKey(0),
                            jnp.zeros((1, 384, 768, 3)), None,
                            init_kwargs={"train": True})
    return model, params, bs


def bench_adam():
    import jax
    import jax.numpy as jnp
    import optax

    _, params, _ = _vistas_params()
    n_leaves = len(jax.tree_util.tree_leaves(params))
    n_params = sum(l.size for l in jax.tree_util.tree_leaves(params))
    # adam reads g, mu, nu, p and writes mu, nu, p — 7 f32 passes
    floor_ms = 28 * n_params / (V5E_HBM_GBS * 1e9) * 1e3
    print(f"vistas tree: {n_leaves} leaves, {n_params / 1e6:.1f}M params, "
          f"update byte floor {floor_ms:.2f} ms", flush=True)

    # constant grads are fine: every update still depends on the carried
    # moments, so nothing hoists out of the scan
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-4, dtype=jnp.float32), params)

    out = {"n_params_m": round(n_params / 1e6, 1),
           "update_byte_floor_ms": round(floor_ms, 2)}

    def run_variant(name, tx, p0, g_host):
        def timed(n):
            @jax.jit
            def run(p0, opt0, g):
                # g travels as a jit ARGUMENT (a closure would bake the
                # whole grad tree into the executable as constants)
                def step(st, i):
                    p, opt = st
                    updates, opt = tx.update(g, opt, p)
                    return (optax.apply_updates(p, updates), opt), None

                st, _ = jax.lax.scan(step, (p0, opt0),
                                     jnp.arange(n, dtype=jnp.float32))
                # touch EVERY param leaf: with constant grads the
                # per-leaf update chains are mutually independent and
                # XLA's loop simplifier DCEs any carried chain whose
                # output is unobserved — a single-leaf probe measured
                # 0.1 ms for the whole tree (first run of this tool)
                return sum(jnp.ravel(l)[0]
                           for l in jax.tree_util.tree_leaves(st[0]))

            opt0 = tx.init(p0)

            def fetch(out):
                np.asarray(jax.device_get(out)).ravel()[:1]

            fetch(run(p0, opt0, g_host))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fetch(run(p0, opt0, g_host))
                best = min(best, time.perf_counter() - t0)
            return best

        for scale in (1, 3):
            n_hi = 1 + 8 * scale
            ms = (timed(n_hi) - timed(1)) / (n_hi - 1) * 1e3
            if ms > 0.05:
                break
        print(f"  adam[{name}]: {ms:.1f} ms/step "
              f"({ms / floor_ms:.1f}x byte floor)", flush=True)
        out[f"adam_{name}_ms"] = round(ms, 2)

    run_variant("tree", optax.adam(1e-5), params, grads)
    run_variant("flat", optax.flatten(optax.adam(1e-5)), params, grads)

    flat_p = jnp.concatenate([jnp.ravel(l) for l in
                              jax.tree_util.tree_leaves(params)])
    flat_g = jnp.full_like(flat_p, 1e-4)
    run_variant("preflat", optax.adam(1e-5), flat_p, flat_g)
    return out


def _bn_shapes():
    """BN input shapes of the exact Vistas train graph, via shape-only
    capture (no FLOPs run): every NormAct/BatchNorm input at B=30."""
    import jax
    import jax.numpy as jnp

    model, params, bs = _vistas_params()

    def fwd(x):
        return model.apply(
            {"params": params, "batch_stats": bs}, x, None, train=True,
            mutable=["batch_stats", "intermediates"],
            capture_intermediates=lambda mdl, name: "bn" in type(mdl).__name__.lower()
            or "norm" in type(mdl).__name__.lower())

    shaped = jax.eval_shape(fwd, jax.ShapeDtypeStruct(
        (VISTAS_B, 384, 768, 3), jnp.float32))
    inter = shaped[1]["intermediates"]
    shapes = []

    def walk(tree):
        if isinstance(tree, dict):
            for v in tree.values():
                walk(v)
        elif isinstance(tree, (list, tuple)):
            for v in tree:
                walk(v)
        else:
            if hasattr(tree, "shape") and len(tree.shape) == 4:
                shapes.append(tuple(tree.shape))

    walk(inter)
    return shapes


def _reduce_ms(x, dy, mean, inv, n_small=1, n_large=9):
    """Scan-differenced ms for one dgamma/dbeta reduce; x/dy are jit args
    (scan invariants), only the (2, C) accumulator is carried."""
    import jax
    import jax.numpy as jnp

    def timed(n):
        @jax.jit
        def run(x, dy, st0):
            def step(st, i):
                dg, db = st
                # xhat recomputes elementwise from x (what the real
                # backward's reduce fusion does); the +i perturb fuses
                # into the producer — no extra memory pass
                dy_i = dy + i * jnp.bfloat16(1e-9)
                xhat = (x.astype(jnp.float32) - mean) * inv
                dgamma = jnp.sum(xhat * dy_i.astype(jnp.float32),
                                 axis=(0, 1, 2))
                dbeta = jnp.sum(dy_i.astype(jnp.float32), axis=(0, 1, 2))
                return (dg + dgamma, db + dbeta), None

            st, _ = jax.lax.scan(step, st0,
                                 jnp.arange(n, dtype=jnp.bfloat16))
            return st[0]

        st0 = (jnp.zeros(mean.shape, jnp.float32),
               jnp.zeros(mean.shape, jnp.float32))

        def fetch(out):
            np.asarray(jax.device_get(out)).ravel()[:1]

        fetch(run(x, dy, st0))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fetch(run(x, dy, st0))
            best = min(best, time.perf_counter() - t0)
        return best

    for scale in (1, 3):
        n_hi = n_small + (n_large - n_small) * scale
        ms = (timed(n_hi) - timed(n_small)) / (n_hi - n_small) * 1e3
        if ms > 0.05:
            return ms
    return ms


def bench_reduce():
    """dgamma/dbeta reduces at the captured shapes, grouped to fit HBM."""
    import jax
    import jax.numpy as jnp

    shapes = _bn_shapes()
    if not shapes:
        # capture filter found nothing (module names changed): fall back to
        # the canonical ResNeXt-50 stage shapes at 384x768 so the bench
        # still answers the throughput question
        print("WARNING: intermediate capture found no BN inputs; "
              "using canonical stage shapes", flush=True)
        shapes = ([(VISTAS_B, 192, 384, 64)]
                  + [(VISTAS_B, 96, 192, 128)] * 3
                  + [(VISTAS_B, 96, 192, 256)] * 3
                  + [(VISTAS_B, 48, 96, 256)] * 4
                  + [(VISTAS_B, 48, 96, 512)] * 4
                  + [(VISTAS_B, 24, 48, 512)] * 6
                  + [(VISTAS_B, 24, 48, 1024)] * 6
                  + [(VISTAS_B, 24, 48, 1024)] * 3
                  + [(VISTAS_B, 24, 48, 2048)] * 3)

    from collections import Counter

    counts = Counter(shapes)
    total_bytes = sum(2 * 2 * int(np.prod(s)) * c for s, c in counts.items())
    total_floor = total_bytes / (V5E_HBM_GBS * 1e9) * 1e3
    print(f"{len(shapes)} BN inputs, {len(counts)} distinct shapes, "
          f"total read {total_bytes / 1e9:.1f} GB, "
          f"floor {total_floor:.1f} ms", flush=True)

    rows = []
    total_ms = 0.0
    for shape, count in sorted(counts.items(), key=lambda kv: -np.prod(kv[0])):
        n, h, w, c = shape
        rng = np.random.RandomState(0)
        # x/dy MUST travel as jit ARGUMENTS: closed-over they become
        # executable constants and the first version of this tool spent
        # 25+ min shipping a gigabyte executable through the compile
        # relay without finishing one shape
        x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
        dy = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
        mean = jnp.asarray(rng.randn(c), jnp.float32)
        inv = jnp.asarray(1.0 + rng.rand(c), jnp.float32)

        ms = _reduce_ms(x, dy, mean, inv)
        bytes_ = 2 * 2 * n * h * w * c
        floor = bytes_ / (V5E_HBM_GBS * 1e9) * 1e3
        rows.append({"shape": list(shape), "count": count,
                     "ms_each": round(ms, 3), "floor_ms": round(floor, 3),
                     "x_floor": round(ms / floor, 1)})
        total_ms += ms * count
        print(f"  {str(shape):>22s} x{count:2d}: {ms:7.3f} ms "
              f"(floor {floor:6.3f}, {ms / floor:5.1f}x)", flush=True)

    print(f"TOTAL isolated dgamma/dbeta: {total_ms:.1f} ms "
          f"(floor {total_floor:.1f}, {total_ms / total_floor:.1f}x) — "
          f"round-4 trace billed ~87 ms in the full step", flush=True)
    return {"reduce_total_ms": round(total_ms, 1),
            "reduce_floor_ms": round(total_floor, 1),
            "reduce_rows": rows}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", nargs="?", default="all",
                    choices=("adam", "reduce", "all"))
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from heatnet_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    out = {}
    if args.what in ("adam", "all"):
        out.update(bench_adam())
    if args.what in ("reduce", "all"):
        out.update(bench_reduce())
    if args.json:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
