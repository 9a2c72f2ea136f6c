"""Per-stage bf16 roofline for PSPNet-ResNet50 (BASELINE config #1).

VERDICT r4 Weak-list item: the PSPNet fps numbers (180/292/330 at batch
8/64/128, tools/bench_pspnet.py) were bare measurements with no bound
analysis, unlike the flagship's 447 fps which has a per-stage MXU/HBM
floor proof (tools/bench_bf16_roofline.py). Same method here, for the
PSPNet graph at the Freiburg eval point 320x704:

- stage decomposition: stem (7x7 s2 + BN + maxpool), layer1..layer4
  (dilated torchvision geometry: layer3/4 stride 1 dilation 2/4 —
  extractors.py ResNet, reference extractors.py:145-146), psp
  (PSPModule pyramid + bottleneck), up1/up2/up3 (PSPUpsample), final;
- per stage: measured ms (pipelined per-call — an UPPER bound per the
  bench_bf16_roofline caveats: non-overlapped relay dispatch rides
  along; use for ranking), XLA cost-model FLOPs and bytes (exact),
  compute floor at 197 TFLOP/s bf16, HBM floor at 819 GB/s, and the
  roofline bound max(floors);
- composite: sum of stage bounds vs the measured e2e batch time from
  tools/bench_pspnet.py — e2e/bound near 1 means the graph is at its
  serial composite roofline and the remaining gap is hardware, not
  graph shape.

Run on the real chip:
    python tools/bench_pspnet_roofline.py [--batch 128]

Measured results are recorded in README next to the PSPNet fps table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_TFLOPS_BF16 = 197.0
V5E_HBM_GBS = 819.0


def build_stage(name: str, batch: int):
    """(module, example input) for one PSPNet stage at 320x704 eval."""
    import jax.numpy as jnp
    from flax import linen as nn

    from heatnet_tpu.models.extractors import Bottleneck, _Layer
    from heatnet_tpu.models.layers import conv, max_pool_3x3_s2
    from heatnet_tpu.models.pspnet import PSPModule, PSPUpsample

    dt = jnp.bfloat16

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = conv(64, 7, stride=2, padding=3, name="conv1", dtype=dt)(x)
            x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, dtype=dt, name="bn1")(x)
            return max_pool_3x3_s2(nn.relu(x))

    class Final(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(13, (1, 1), use_bias=True, dtype=dt,
                           name="final")(x).astype(jnp.float32)

    class Eval(nn.Module):
        """train=False wrapper so stage modules share one interface."""
        inner: nn.Module

        @nn.compact
        def __call__(self, x):
            return self.inner(x, train=False)

    h, w = 320, 704
    z = lambda hh, ww, c: jnp.zeros((batch, hh, ww, c), dt)  # noqa: E731
    stages = {
        "stem": (Stem(), z(h, w, 3)),
        "layer1": (Eval(_Layer(Bottleneck, 64, 3, dtype=dt)),
                   z(h // 4, w // 4, 64)),
        "layer2": (Eval(_Layer(Bottleneck, 128, 4, stride=2, dtype=dt)),
                   z(h // 4, w // 4, 256)),
        "layer3": (Eval(_Layer(Bottleneck, 256, 6, stride=1, dilation=2,
                               dtype=dt)), z(h // 8, w // 8, 512)),
        "layer4": (Eval(_Layer(Bottleneck, 512, 3, stride=1, dilation=4,
                               dtype=dt)), z(h // 8, w // 8, 1024)),
        "psp": (PSPModule(1024, dtype=dt), z(h // 8, w // 8, 2048)),
        "up1": (Eval(PSPUpsample(256, dtype=dt)), z(h // 8, w // 8, 1024)),
        "up2": (Eval(PSPUpsample(64, dtype=dt)), z(h // 4, w // 4, 256)),
        "up3": (Eval(PSPUpsample(64, dtype=dt)), z(h // 2, w // 2, 64)),
        "final": (Final(), z(h, w, 64)),
    }
    return stages[name]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--stages", default="stem,layer1,layer2,layer3,layer4,"
                                        "psp,up1,up2,up3,final")
    args = ap.parse_args()

    import jax

    from bench_bf16_roofline import stage_cost, stage_time_ms
    from heatnet_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    os.environ.pop("HEATNET_QUANT", None)

    rows = []
    for name in args.stages.split(","):
        mod, x = build_stage(name, args.batch)
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
