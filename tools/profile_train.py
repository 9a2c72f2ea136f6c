"""Device-trace attribution for the TRAINING steps (VERDICT r3 item 1).

Traces the Vistas supervised step (B=30 @ 768x384, heatnet_conf batch) or
the adversarial seg step (B=16 @ 640x320) on the real chip and buckets
device time per op / per category via the xplane parse shared with
tools/profile_infer.py. Also prints the compiled step's own cost model
(post-fusion FLOPs / HBM bytes) against v5e peaks — the speed-of-light
floors for THIS graph, separating "the graph is bigger than it should be"
from "the graph runs below the hardware roofline".

Respects the same env knobs as the step itself (HEATNET_GC_IMPL,
HEATNET_GC_TRAIN_MIN_CPG/WORK, HEATNET_REMAT_STAGES), so dispatch/remat
variants can be attributed, not just timed.

Run on the real chip:
    python tools/profile_train.py vistas [--batch 30] [--trace]
    python tools/profile_train.py adv    [--batch 16] [--trace]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from profile_infer import V5E_HBM_GBS, V5E_PEAK_TFLOPS_BF16, parse_xplane


def build_vistas(batch):
    import jax
    import jax.numpy as jnp
    import optax

    from heatnet_tpu.core.cache import enable_compilation_cache
    from heatnet_tpu.models import ResNeXtSeg
    from heatnet_tpu.train.state import TrainState, init_model
    from heatnet_tpu.train.supervised import make_train_step

    enable_compilation_cache()
    model = ResNeXtSeg(structure=(3, 4, 6, 3), input_channels=3,
                       classes=14, input_3x3=True, dtype=jnp.bfloat16,
                       remat=True)
    params, bs = init_model(model, jax.random.PRNGKey(0),
                            jnp.zeros((1, 384, 768, 3)), None,
                            init_kwargs={"train": True})
    st = TrainState.create(model.apply, params, bs, optax.adam(1e-5))
    step = make_train_step(model)
    rng = np.random.RandomState(0)
    vb = {"image": jnp.asarray(rng.rand(batch, 384, 768, 3), jnp.float32),
          "label": jnp.asarray(rng.randint(0, 14, (batch, 384, 768)),
                               jnp.int32)}
    probe = lambda s: s.params["mod1"]["conv1"]["kernel"]
    return step, st, (vb,), probe


def build_adv(batch):
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.core.cache import enable_compilation_cache
    from heatnet_tpu.models import ConfSegnet
    from heatnet_tpu.train.adversarial import (AdversarialConfig,
                                               AdversarialTrainState,
                                               make_adversarial_steps,
                                               make_phase_optimizers)
    from heatnet_tpu.train.state import init_model

    enable_compilation_cache()
    h, w = 320, 640
    rng = np.random.RandomState(0)
    batch_d = {
        "rgb_day": jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32),
        "ir_day": jnp.asarray(rng.rand(batch, h, w, 1), jnp.float32),
        "rgb_night": jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32),
        "ir_night": jnp.asarray(rng.rand(batch, h, w, 1), jnp.float32),
        "label_day": jnp.asarray(rng.randint(0, 13, (batch, h, w)), jnp.int32),
        "mod_drop_params": jnp.zeros((batch, 4), jnp.float32),
    }
    model = ConfSegnet(disc_arch="cyclegan", num_critics=6,
                       structure=(3, 4, 6, 3), dtype=jnp.bfloat16, remat=True)
    ins = [jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 1))]
    params, bs = init_model(model, jax.random.PRNGKey(0), ins, ins,
                            init_kwargs={"train": True})
    seg_tx, critic_tx = make_phase_optimizers(1e-4)
    state = AdversarialTrainState.create(params, bs, seg_tx, critic_tx)
    cfg = AdversarialConfig(modalities="ir_rgb", moddrop=True, irscale=True)
    seg_step, _ = make_adversarial_steps(model, cfg, None, None)
    k = jax.random.PRNGKey(0)
    probe = lambda st: (st.params["trgb_segnet"]["mod1"]["conv1"]["kernel"],
                        st.params["critics_0"]["conv1"]["kernel"])
    return (lambda st, b: seg_step(st, b, k)), state, (batch_d,), probe


def main():
    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["vistas", "adv"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--scan", action="store_true",
                    help="trace the scan-differenced graph (the one "
                         "tools/bench_train_step.py times) instead of the "
                         "per-call step")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()
    batch = args.batch or {"vistas": 30, "adv": 16}[args.kind]

    step, state, batch_args, probe = (
        build_vistas(batch) if args.kind == "vistas" else build_adv(batch))

    if args.scan:
        # Trace the EXACT graph the throughput bench times: N steps inside
        # one jitted lax.scan with per-iteration batch perturbation. The
        # per-call executable below compiles differently — under profiling
        # residency XLA host-offloads cold params (S(1) copy-starts were
        # 62% of its device time, 6320 ms/iter vs the scan's real 617) —
        # so only this mode attributes the published numbers.
        import jax.numpy as jnp

        b0 = batch_args[0]
        n = max(args.iters, 5)

        def perturb(b, i):
            return {k: (v + i * 1e-9
                        if jnp.issubdtype(v.dtype, jnp.floating) else v)
                    for k, v in b.items()}

        def body(st, i):
            out = step(st, perturb(b0, i))
            new = out[0] if isinstance(out, tuple) else out
            return new, None

        @jax.jit
        def run(st):
            st2, _ = jax.lax.scan(body, st, jnp.arange(n, dtype=jnp.float32))
            return probe(st2)

        out = run(state)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[:1]
        logdir = f"/tmp/heatnet_train_scantrace_{args.kind}"
        jax.profiler.start_trace(logdir)
        out = run(state)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[:1]
        jax.profiler.stop_trace()
        parse_xplane(logdir, iters=n, top=30)
        return

    # compile + cost model. The step returns (new_state, metrics); lower on
    # the concrete args.
    import jax.numpy as jnp  # noqa: F401

    # Donate the state: without it the profiled process keeps old+new
    # state alive across the chained calls and XLA host-offloads cold
    # params (S(1) copy-starts dominated the first trace of this step at
    # 56.8% of device time, 5535 ms/iter vs the real 617) — the trace must
    # run under the same residency the training loop has, where the state
    # is threaded through scan/donation and only one copy is live.
    jitted = jax.jit(step, donate_argnums=0)
    lowered = jitted.lower(state, *batch_args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = cost.get("flops", 0.0)
    bytes_acc = cost.get("bytes accessed", 0.0)
    t_flop_ms = flops / (V5E_PEAK_TFLOPS_BF16 * 1e12) * 1e3
    t_hbm_ms = bytes_acc / (V5E_HBM_GBS * 1e9) * 1e3
    print(f"compiled {args.kind} step B={batch}: {flops / 1e12:.2f} TFLOP "
          f"(compute floor {t_flop_ms:.1f} ms), {bytes_acc / 1e9:.2f} GB "
          f"HBM (bandwidth floor {t_hbm_ms:.1f} ms)", flush=True)

    # warm up, then trace N steps. The state is DONATED through the chain
    # (matching the training loop's residency); `state` and `new_state`
    # references are dropped as they are consumed so exactly one copy is
    # ever live on device.
    st, _ = jitted(state, *batch_args)
    del state
    jax.block_until_ready(st.params)
    if args.trace:
        logdir = f"/tmp/heatnet_train_trace_{args.kind}"
        jax.profiler.start_trace(logdir)
        for _ in range(args.iters):
            st, metrics = jitted(st, *batch_args)
        jax.block_until_ready(st.params)
        jax.profiler.stop_trace()
        parse_xplane(logdir, iters=args.iters, top=30)


if __name__ == "__main__":
    main()
