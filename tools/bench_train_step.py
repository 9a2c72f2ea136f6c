"""Training-step throughput on the real chip.

Measures the two core training workloads at their reference operating
points (BASELINE.md):
- adversarial seg + critic steps (ConfSegnet ResNeXt-50 with 6 cyclegan
  FCDiscriminator critics, the default config) at 640x320 crops,
- Vistas supervised step (ResNeXt-50, 3x3 stem per heatnet_conf.json,
  14 classes) at 768x384.

Each config runs in its OWN subprocess: leftover device buffers and
compiled executables from a previous config crowd HBM and re-introduce the
very spilling the per-stage remat removes (measured: vistas batch-30 is
166 ms/step in a fresh process vs ~1.4 s/step after the adversarial
sections ran in the same process).

Measured v5e numbers (2026-08-16, remat=True + work-volume grouped-conv
dispatch, per-config subprocess):
  adv  B=4  seg 11.1 ms / critic 16.1 ms      (249-360 fps)
  adv  B=16 seg 74.2 ms / critic 64.8 ms      (critic was 1015 ms pre-remat)
  vistas B=8  24.9 ms  (vs 85 at round start)
  vistas B=30 88.0 ms  (vs 1466 at round start — 16.7x: remat 8.4x, then
  grouped-conv dispatch 2x — dense block-diagonal kernels pay the 64x
  structural-zero tax in BOTH gradient convs, so training favors native
  grouped far more than the forward-only microbench suggested)

Run: `python tools/bench_train_step.py [adv_batches ...]`.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _run_one(kind: str, batch: int) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from heatnet_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    B = batch

    def timeit(fn, iters=10):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    if kind == "adv":
        from heatnet_tpu.models import ConfSegnet
        from heatnet_tpu.train.adversarial import (AdversarialConfig,
                                                   AdversarialTrainState,
                                                   make_adversarial_steps,
                                                   make_phase_optimizers)
        from heatnet_tpu.train.state import init_model

        h, w = 320, 640
        rng = np.random.RandomState(0)
        batch_d = {
            "rgb_day": rng.rand(B, h, w, 3).astype(np.float32),
            "ir_day": rng.rand(B, h, w, 1).astype(np.float32),
            "rgb_night": rng.rand(B, h, w, 3).astype(np.float32),
            "ir_night": rng.rand(B, h, w, 1).astype(np.float32),
            "label_day": rng.randint(0, 13, (B, h, w)).astype(np.int32),
            "mod_drop_params": np.zeros((B, 4), np.float32),
        }
        model = ConfSegnet(disc_arch="cyclegan", num_critics=6,
                           structure=(3, 4, 6, 3), dtype=jnp.bfloat16,
                           remat=True)
        ins = [jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 1))]
        params, bs = init_model(model, jax.random.PRNGKey(0), ins, ins,
                                init_kwargs={"train": True})
        seg_tx, critic_tx = make_phase_optimizers(1e-4)
        state = AdversarialTrainState.create(params, bs, seg_tx, critic_tx)
        cfg = AdversarialConfig(modalities="ir_rgb", moddrop=True,
                                irscale=True)
        seg_step, critic_step = make_adversarial_steps(model, cfg, None, None)
        k = jax.random.PRNGKey(0)
        seg_ms = timeit(lambda: seg_step(state, batch_d, k)[0].params)
        cr_ms = timeit(lambda: critic_step(state, batch_d)[0].params)
        print(json.dumps({
            "seg_step_ms": round(seg_ms, 1), "critic_step_ms": round(cr_ms, 1),
            "seg_fps": round(B / seg_ms * 1e3, 1),
            "critic_fps": round(B / cr_ms * 1e3, 1)}))
    else:
        from heatnet_tpu.models import ResNeXtSeg
        from heatnet_tpu.train.state import TrainState, init_model
        from heatnet_tpu.train.supervised import make_train_step

        # heatnet_conf.json uses input_3x3=true (the 7x7 stem's 2x-output
        # geometry would crash the reference's own CE, a latent defect)
        model = ResNeXtSeg(structure=(3, 4, 6, 3), input_channels=3,
                           classes=14, input_3x3=True, dtype=jnp.bfloat16,
                           remat=True)
        params, bs = init_model(model, jax.random.PRNGKey(0),
                                jnp.zeros((1, 384, 768, 3)), None,
                                init_kwargs={"train": True})
        st = TrainState.create(model.apply, params, bs, optax.adam(1e-5))
        step = make_train_step(model)
        rng = np.random.RandomState(0)
        vb = {"image": rng.rand(B, 384, 768, 3).astype(np.float32),
              "label": rng.randint(0, 14, (B, 384, 768)).astype(np.int32)}
        ms = timeit(lambda: step(st, vb)[0].params)
        print(json.dumps({"step_ms": round(ms, 1),
                          "fps": round(B / ms * 1e3, 1)}))


def main() -> None:
    if os.environ.get("_HEATNET_TRAINBENCH_CHILD"):
        _run_one(sys.argv[1], int(sys.argv[2]))
        return

    adv_batches = [int(b) for b in sys.argv[1:]] or [4, 16]
    configs = ([("adv", b) for b in adv_batches]
               + [("vistas", 8), ("vistas", 30)])
    results = {}
    env = dict(os.environ, _HEATNET_TRAINBENCH_CHILD="1")
    here = os.path.abspath(__file__)
    # the child's sys.path[0] is tools/, not the repo root, and the package
    # is not pip-installed — APPEND the root to PYTHONPATH (never replace:
    # the ambient PYTHONPATH is how the TPU plugin's sitecustomize is found)
    repo_root = os.path.dirname(os.path.dirname(here))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    for kind, b in configs:
        proc = subprocess.run([sys.executable, here, kind, str(b)], env=env,
                              capture_output=True, text=True, timeout=3600)
        line = [l for l in proc.stdout.strip().splitlines()
                if l.startswith("{")]
        results[f"{kind}_B{b}"] = (json.loads(line[-1]) if line
                                   else {"error": proc.stderr[-300:]})
        print(f"{kind} B={b}:", json.dumps(results[f"{kind}_B{b}"]),
              flush=True)
    print("FINAL", json.dumps(results))


if __name__ == "__main__":
    main()
