"""PSPNet-ResNet50 RGB-only inference bench (BASELINE.json config #1).

The first of the five mandated configs: RGB-only PSPNet on the dilated
ResNet-50 extractor (8x downsampling, PSP pyramid (1,2,3,6), 3x 2x
upsample head — models/confusion_maximization/models/pspnet.py:43-76).
Measured at the Freiburg eval resolution 320x704 (BASELINE.md operating
points), bf16, uint8 ingest like the flagship bench.

Run: `python tools/bench_pspnet.py [batch ...]` (default sweep 8 64 128).

Measured v5e numbers (2026-08-17, single chip):
  batch 8:   179.8 fps
  batch 64:  292.0 fps
  batch 128: 329.8 fps  <- ~0.8x the ResNeXt-ASPP flagship: the dilated
                           torchvision-style ResNet-50 runs layers 3-4 at
                           stride 8 with full 1024/2048-channel dense
                           convs (no grouped-conv savings), so the
                           backbone carries more FLOPs than ResNeXt's
                           grouped stages.
  batch 64, int8: 325.7 fps (HEATNET_QUANT=int8 + calibrate_int8) —
                  +11.5% over bf16 at the same batch, ~equal to the bf16
                  batch-128 sweet spot; PSPNet's dense convs all ride the
                  Int8Conv path so it gains more per-batch than ResNeXt.

Round 5 (2026-08-21, chunked PSP bottleneck — models/pspnet.PSPModule
default dispatch; bf16): batch 8: 199.7, batch 64: 342.9, batch 128:
396.0 fps (+11/+17/+20%). Per-stage roofline in
tools/bench_pspnet_roofline.py / README. (The int8 row above predates
the chunked dispatch.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_one(batch: int) -> float:
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.core.cache import enable_compilation_cache
    from heatnet_tpu.models import PSPNet

    enable_compilation_cache()
    model = PSPNet(backend="resnet50", dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    rgb8 = jnp.asarray(rng.randint(0, 255, (batch, 320, 704, 3)), jnp.uint8)

    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((batch, 320, 704, 3)))

    @jax.jit
    def infer(rgb8):
        x = (rgb8.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        seg, _, _ = model.apply(variables, x, train=False)
        return jnp.argmax(seg, axis=-1)

    for _ in range(3):
        out = infer(rgb8)
    out.block_until_ready()

    chunks, iters = 4, 4
    t0 = time.perf_counter()
    for _ in range(chunks):
        for _ in range(iters):
            out = infer(rgb8)
        out.block_until_ready()
    return batch * chunks * iters / (time.perf_counter() - t0)


def main() -> None:
    batches = [int(a) for a in sys.argv[1:]] or [8, 64, 128]
    results = {}
    for b in batches:
        results[f"batch_{b}"] = round(bench_one(b), 2)
        print(json.dumps({"metric": "pspnet_rgb_inference_fps_320x704",
                          "unit": "frames/sec/chip", **results}))


if __name__ == "__main__":
    main()
