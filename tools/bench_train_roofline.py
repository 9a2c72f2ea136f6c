"""Per-stage TRAINING roofline for the Vistas supervised step (B=30).

The e2e step (tools/bench_train_step.py, scan-differenced) measures
617 ms against a 390 ms HBM floor (tools/profile_train.py cost model) —
1.58x. The scan-graph device trace can't break the while-body down (the
xplane lumps it into one %while event and the rest of its lines are
async S(1) param-offload DMA spans), so this tool decomposes the step
the way tools/bench_bf16_roofline.py does for inference: each backbone
stage's forward+backward measured STANDALONE, scan-differenced with the
stage's params as the carry (small, so no carry-copy artifact), under
the stage's SHIPPED remat mode ('1' mod2/mod3, 'c' mod4/mod5 — the
HEATNET_REMAT_STAGES=11cc default), against XLA's own post-fusion cost
model of that stage's fwd+bwd.

Caveats (same spirit as the inference roofline's):
- standalone stages run without the full step's HBM residency, so they
  are LOWER bounds on their in-step cost (no param-offload interference);
  the ranking and the per-stage x-of-bound are the signal.
- the cost model is of the standalone fwd+bwd graph, which matches the
  in-step stage up to boundary-tensor handoffs.

Stage shapes (Vistas heatnet_conf: 384x768 input, input_3x3 stem, /8
trunk): stem 384x768x3 -> 96x192x64; mod2 96x192 (64->256);
mod3 -> 48x96 (256->512); mod4 48x96 dilated (512->1024);
mod5 48x96 dilated (1024->2048); head = bn_out+ASPP+deconv+fuse+CE at
full res vs int labels.

Run on the real chip:
    python tools/bench_train_roofline.py [--batch 30] [--stages ...]
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


def build_stage(name, batch):
    """(module, example_inputs, init_kwargs) at Vistas B shapes with the
    shipped remat wrapping."""
    import jax.numpy as jnp
    from flax import linen as nn

    from heatnet_tpu.models.layers import (ABN, ASPP, BN_STATS_SAVE_POLICY,
                                           CONV_SAVE_POLICY, FuseModule,
                                           InitBlock, NormAct, deconv)
    from heatnet_tpu.models.trgb_segnet import _Stage

    na = NormAct()
    rng = np.random.RandomState(0)
    mask = os.environ.get("HEATNET_REMAT_STAGES", "11cc")

    def x(h, w, c):
        return jnp.asarray(rng.rand(batch, h, w, c), jnp.bfloat16)

    def stage_cls(mod_id):
        m = mask[mod_id]
        if m == "1":
            return nn.remat(_Stage, static_argnums=(2,),
                            policy=BN_STATS_SAVE_POLICY)
        if m == "c":
            return nn.remat(_Stage, static_argnums=(2,),
                            policy=CONV_SAVE_POLICY)
        return _Stage

    if name == "stem":
        return InitBlock(na, jnp.bfloat16), (jnp.asarray(
            rng.rand(batch, 384, 768, 3), jnp.float32),)
    if name == "mod2":
        return (stage_cls(0)(3, (128, 128, 256), 0, 64, (1, 1, 2, 4), na,
                             jnp.bfloat16), (x(96, 192, 64),))
    if name == "mod3":
        return (stage_cls(1)(4, (256, 256, 512), 1, 64, (1, 1, 2, 4), na,
                             jnp.bfloat16), (x(96, 192, 256),))
    if name == "mod4":
        return (stage_cls(2)(6, (512, 512, 1024), 2, 64, (1, 1, 2, 4), na,
                             jnp.bfloat16), (x(48, 96, 512),))
    if name == "mod5":
        return (stage_cls(3)(3, (1024, 1024, 2048), 3, 64, (1, 1, 2, 4), na,
                             jnp.bfloat16), (x(48, 96, 1024),))
    if name == "head":
        class _Head(nn.Module):
            @nn.compact
            def __call__(self, seg5, out_2, train=False):
                seg_d = ABN(na, jnp.bfloat16, name="bn_out_1")(seg5, train)
                seg, _fusion, _cf = ASPP(14, cert_head=True, norm_act=na,
                                         dtype=jnp.bfloat16,
                                         name="aspp")(seg_d, train)
                seg = deconv(14, 4, 2, 1, name="up_seg_2",
                             dtype=jnp.bfloat16)(seg)
                seg = FuseModule(14, na, jnp.bfloat16, name="fuse_seg")(
                    jnp.concatenate([seg, out_2], axis=-1), train)
                return seg.astype(jnp.float32)

        return _Head(), (x(48, 96, 2048), x(96, 192, 256))
    raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=30)
    ap.add_argument("--stages", default="stem,mod2,mod3,mod4,mod5,head")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from heatnet_tpu.core.cache import enable_compilation_cache
    from heatnet_tpu.train.supervised import cross_entropy_ignore

    enable_compilation_cache()
    B = args.batch
    rng = np.random.RandomState(1)
    labels = jnp.asarray(rng.randint(0, 14, (B, 384, 768)), jnp.int32)

    def scan_timeit(body, carry0, ins0, probe, n_small=1, n_large=5):
        """ms/iter, scan-differenced (bench_train_step.py's method; the
        carry here is the stage's params+stats — small, so the carry
        aliasing artifact that breaks inference-stage scans is absent).
        ``ins0`` are jit ARGUMENTS, not closures: a closed-over stage
        input is baked into the HLO as a constant and mod3's 283 MB blew
        the remote-compile relay's request-size limit (HTTP 413)."""

        def timed(n):
            @jax.jit
            def run(c, *ins):
                c2, _ = jax.lax.scan(lambda c, i: (body(c, i, *ins), None),
                                     c, jnp.arange(n, dtype=jnp.float32))
                return probe(c2)

            def fetch(out):
                for leaf in jax.tree_util.tree_leaves(out):
                    np.asarray(jax.device_get(leaf)).ravel()[:1]

            fetch(run(carry0, *ins0))
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fetch(run(carry0, *ins0))
                best = min(best, time.perf_counter() - t0)
            return best

        for scale in (1, 3):
            n_hi = n_small + (n_large - n_small) * scale
            ms = (timed(n_hi) - timed(n_small)) / (n_hi - n_small) * 1e3
            if ms > 0.5:
                return ms
        return ms

    rows = []
    for name in args.stages.split(","):
        mod, inputs = build_stage(name, B)
        # train is STATIC through the remat wrapping — close over it
        # instead of passing through jit (a traced bool would break
        # nn.remat's static_argnums)
        variables = jax.jit(lambda r, *ins: mod.init(r, *ins, True))(
            {"params": jax.random.PRNGKey(0)}, *inputs)

        def loss_fn(variables, *ins, name=name, mod=mod):
            out, _ = mod.apply(variables, *ins, True,
                               mutable=["batch_stats"])
            if name == "head":
                return cross_entropy_ignore(out, labels)
            # scalarize: mean in f32 (one extra read of the output)
            return jnp.mean(out.astype(jnp.float32))

        grad_fn = jax.value_and_grad(loss_fn)

        # cost model of one fwd+bwd
        compiled = jax.jit(grad_fn).lower(variables, *inputs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops, bts = cost.get("flops", 0.0), cost.get("bytes accessed", 0.0)
        t_flop = flops / (V5E_PEAK_TFLOPS_BF16 * 1e12) * 1e3
        t_hbm = bts / (V5E_HBM_GBS * 1e9) * 1e3

        def body(variables, i, *ins_args, grad_fn=grad_fn):
            ins = [v + (i * 1e-9).astype(v.dtype) if jnp.issubdtype(
                v.dtype, jnp.floating) else v for v in ins_args]
            _, g = grad_fn(variables, *ins)
            return jax.tree_util.tree_map(
                lambda p, gg: p - 1e-12 * gg.astype(p.dtype) if
                jnp.issubdtype(p.dtype, jnp.floating) else p,
                variables, g)

        probe = lambda v: jax.tree_util.tree_leaves(v["params"])[0]
        ms = scan_timeit(body, variables, inputs, probe)
        bound = max(t_flop, t_hbm)
        rows.append((name, ms, t_flop, t_hbm, bound))
        print(f"  {name:6s} {ms:8.2f} ms  compute floor {t_flop:7.2f}  "
              f"HBM floor {t_hbm:7.2f}  -> bound {bound:7.2f}  "
              f"({ms / bound:4.2f}x, "
              f"{'MXU' if t_flop > t_hbm else 'HBM'}-bound)", flush=True)

    tot = sum(r[1] for r in rows)
    tot_bound = sum(r[4] for r in rows)
    print(json.dumps({
        "batch": B,
        "stage_sum_ms": round(tot, 1),
        "composite_bound_ms": round(tot_bound, 1),
        "x_of_bound": round(tot / tot_bound, 3),
        "stages": {r[0]: {"ms": round(r[1], 2), "flop_floor": round(r[2], 2),
                          "hbm_floor": round(r[3], 2)} for r in rows},
    }))


if __name__ == "__main__":
    main()
