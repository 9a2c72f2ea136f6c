"""Super-group block-diagonal grouped convs: the middle formulation.

tools/bench_train_roofline.py showed mod4's training fwd+bwd is
MXU-"bound" at 85 ms — but ~90% of those FLOPs are the structural zeros
of the block-diagonal DENSE formulation (64 groups expanded to a full
512x512 kernel = 64x useful FLOPs). The native path avoids the zeros but
loses to batch-minor layout copies at small channels-per-group (the
measured dispatch table in models/layers.GroupedConvDense).

Middle ground measured here: express the 64-group conv as a g'-group
NATIVE conv (g' in {4,8,16}) whose per-supergroup kernels are
block-diagonal — FLOP waste drops from 64x to (64/g')x while
channels-per-group rises to cpg*(64/g') (MXU-friendly, >= the native
crossover). Numerics are exactly the dense formulation's (the injected
blocks are zeros; bf16 zero-adds are exact).

Measured fwd+bwd (value_and_grad wrt kernel AND input — the three convs
a training step pays), scan-differenced with the kernel as the carry.

Run on the real chip: `python tools/bench_supergroup.py [--cases ...]`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GROUPS = 64

#: (name, C, (H, W), dilation, batch)
CASES = [
    ("mod4_vistas30", 512, (48, 96), 2, 30),
    ("mod5_vistas30", 1024, (48, 96), 4, 30),
    ("mod3_vistas30", 256, (48, 96), 1, 30),
    ("mod4_adv16", 512, (40, 80), 2, 16),
    ("mod5_adv16", 1024, (40, 80), 4, 16),
    ("mod3_adv16", 256, (40, 80), 1, 16),
    ("mod2_infer128", 128, (80, 176), 1, 128),
    ("mod3_infer128", 256, (40, 88), 1, 128),
    ("mod4_infer128", 512, (40, 88), 2, 128),
    ("mod5_infer128", 1024, (40, 88), 4, 128),
]


def expand_supergroup(kern, groups, g_super, dtype):
    """Grouped kernel (kh,kw,cpg,F) -> block-diagonal (kh,kw,cpg',F) for
    feature_group_count=g_super, where cpg' = cpg * (groups/g_super).

    Output feature f belongs to true group g(f) = f // (F/groups) and to
    supergroup s(f) = f // (F/g_super); within its supergroup the true
    group occupies input slots [(g(f) % gpers) * cpg, +cpg)."""
    import jax.numpy as jnp

    kh, kw, cpg, F = kern.shape
    gpers = groups // g_super          # true groups per supergroup
    Fg = F // groups                   # output features per true group
    k6 = kern.reshape(kh, kw, cpg, g_super, gpers, Fg)
    eye = jnp.eye(gpers, dtype=dtype)
    k7 = jnp.einsum("hkcsrf,pr->hkpcsrf", k6, eye)
    return k7.reshape(kh, kw, gpers * cpg, F)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default=",".join(c[0] for c in CASES))
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()
    wanted = set(args.cases.split(","))

    import jax
    import jax.numpy as jnp

    from heatnet_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    dtype = jnp.bfloat16

    def conv(x, k, dil, fgc):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((dil, dil), (dil, dil)), rhs_dilation=(dil, dil),
            feature_group_count=fgc,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def make_apply(g_super, dil):
        def apply(x, kern):
            if g_super == GROUPS:
                return conv(x, kern, dil, GROUPS)
            k = (kern if g_super == GROUPS else
                 expand_supergroup(kern, GROUPS, g_super, dtype))
            return conv(x, k, dil, g_super)
        return apply

    def scan_timeit(body, carry0, x, n_small=1, n_large=9):
        def timed(n):
            @jax.jit
            def run(c, x):
                c2, _ = jax.lax.scan(lambda c, i: (body(c, i, x), None),
                                     c, jnp.arange(n, dtype=jnp.float32))
                return c2
            out = run(carry0, x)
            np.asarray(jax.device_get(
                jax.tree_util.tree_leaves(out)[0])).ravel()[:1]
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                out = run(carry0, x)
                np.asarray(jax.device_get(
                    jax.tree_util.tree_leaves(out)[0])).ravel()[:1]
                best = min(best, time.perf_counter() - t0)
            return best

        for scale in (1, 3):
            n_hi = n_small + (n_large - n_small) * scale
            ms = (timed(n_hi) - timed(n_small)) / (n_hi - n_small) * 1e3
            if ms > 0.2:
                return ms
        return ms

    results = {}
    rng = np.random.RandomState(0)
    for name, c, (h, w), dil, batch in CASES:
        if name not in wanted:
            continue
        cpg = c // GROUPS
        x = jnp.asarray(rng.rand(batch, h, w, c), dtype)
        kern = jnp.asarray(rng.rand(3, 3, cpg, c) * 0.1, dtype)
        row = {}

        # correctness anchor: all formulations vs native, fp32 compare
        ref = None
        variants = [("native", GROUPS), ("dense", 1)] + [
            (f"sg{g}", g) for g in (2, 4, 8, 16)
            if g < GROUPS and c // g >= 32]
        for label, gs in variants:
            apply = make_apply(gs, dil)
            y = jax.jit(apply)(x, kern)
            if ref is None and label == "native":
                ref = y.astype(jnp.float32)
            err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref)))

            if args.fwd_only:
                def body(k, i, x, apply=apply):
                    y = apply(x + (i * 1e-9).astype(dtype), k)
                    return k - (1e-20 * jnp.sum(y)).astype(dtype)
            else:
                def loss(k, x, apply=apply):
                    return jnp.sum(apply(x, k).astype(jnp.float32) ** 2) * 1e-9

                def body(k, i, x, loss=loss):
                    gk, gx = jax.grad(loss, argnums=(0, 1))(
                        k, x + (i * 1e-9).astype(dtype))
                    return k - 1e-12 * gk - (1e-20 * jnp.sum(gx)).astype(dtype)

            ms = scan_timeit(body, kern, x)
            row[label] = {"ms": round(ms, 3), "max_err_vs_native": err}
            print(f"  {name:15s} {label:7s} {ms:8.3f} ms  err {err:.3e}",
                  flush=True)
        results[name] = row
    print("FINAL", json.dumps(results))


if __name__ == "__main__":
    main()
