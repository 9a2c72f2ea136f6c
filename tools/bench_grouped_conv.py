"""Microbenchmark: grouped-conv formulations at ResNeXt-50 trgb scale.

The ResNeXt blocks' grouped 3x3 convs (groups=64) dominate backbone FLOPs.
Three TPU formulations of the same math:

- dense:   block-diagonal dense kernel (GroupedConvDense) — 64x structural-
           zero FLOPs but full-rate MXU.
- native:  XLA's feature_group_count path.
- matmul:  im2col + per-group batched matmul
           (g, N*H*W, 9*cin_pg) @ (g, 9*cin_pg, out_pg).

Stages measured at the flagship eval shape 320x704 (stem /4, mod3 stride 2,
mod4/5 dilated): mod2 128ch@80x176, mod3 256ch@40x88, mod4 512ch@40x88 d2,
mod5 1024ch@40x88 d4. Run on the real chip: `python tools/bench_grouped_conv.py`.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
BATCH = int(os.environ.get('BENCH_BATCH', 8))
GROUPS = 64
STAGES = [
    ("mod2", 128, (80, 176), 1),
    ("mod3", 256, (40, 88), 1),
    ("mod4", 512, (40, 88), 2),
    ("mod5", 1024, (40, 88), 4),
]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    dtype = jnp.bfloat16

    def dense_impl(x, kern, dil):
        c = x.shape[-1]
        cpg = c // GROUPS
        k5 = kern.reshape(3, 3, cpg, GROUPS, cpg)
        eye = jnp.eye(GROUPS, dtype=dtype)
        dense = jnp.einsum("hkcgo,Gg->hkGcgo", k5, eye).reshape(3, 3, c, c)
        return jax.lax.conv_general_dilated(
            x, dense, (1, 1), ((dil, dil), (dil, dil)),
            rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def native_impl(x, kern, dil):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), ((dil, dil), (dil, dil)),
            rhs_dilation=(dil, dil), feature_group_count=GROUPS,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def matmul_impl(x, kern, dil):
        n, h, w, c = x.shape
        cpg = c // GROUPS
        xp = jnp.pad(x, ((0, 0), (dil, dil), (dil, dil), (0, 0)))
        # im2col: 9 shifted views → (N,H,W,9,C)
        cols = jnp.stack([
            jax.lax.dynamic_slice(xp, (0, i * dil, j * dil, 0), (n, h, w, c))
            for i in range(3) for j in range(3)], axis=3)
        cols = cols.reshape(n, h, w, 9, GROUPS, cpg)
        kg = kern.reshape(9, cpg, GROUPS, cpg)  # (9, cin_pg, g, out_pg)
        return jnp.einsum("nhwkgc,kcgo->nhwgo", cols, kg).reshape(n, h, w, c)

    def pallas_impl(x, kern, dil):
        from heatnet_tpu.ops.pallas_grouped_conv import grouped_conv3x3_blockdiag
        return grouped_conv3x3_blockdiag(x, kern, groups=GROUPS, dilation=dil,
                                         dtype=dtype)

    impls = {"dense": dense_impl, "native": native_impl,
             "matmul": matmul_impl, "pallas": pallas_impl}
    if BATCH > 32:
        impls.pop("matmul")  # im2col copy OOMs at large batch
    results = {}
    rng = np.random.RandomState(0)
    for stage, c, (h, w), dil in STAGES:
        x = jnp.asarray(rng.rand(BATCH, h, w, c), dtype)
        kern = jnp.asarray(rng.rand(3, 3, c // GROUPS, c) * 0.1, dtype)
        row = {}
        for name, impl in impls.items():
            f = jax.jit(functools.partial(impl, dil=dil))
            try:
                out = f(x, kern)
                out.block_until_ready()
                # correctness vs native
                ref = jax.jit(functools.partial(native_impl, dil=dil))(x, kern)
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
                t0 = time.perf_counter()
                for _ in range(20):
                    out = f(x, kern)
                out.block_until_ready()
                ms = (time.perf_counter() - t0) / 20 * 1e3
                row[name] = {"ms": round(ms, 3), "max_err_vs_native": err}
            except Exception as e:  # noqa: BLE001
                row[name] = {"error": str(e)[:200]}
        results[stage] = row
        print(stage, json.dumps(row), flush=True)
    print("FINAL", json.dumps(results))


if __name__ == "__main__":
    main()
