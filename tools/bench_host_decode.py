"""Host input-pipeline bench: PNG decode throughput vs. serving demand.

At 500 fps/chip int8 serving (bench.py) a v5e-8 slice consumes ~4000
frames/sec; the host must decode 960x320 RGB PNGs + 16-bit IR PNGs at that
rate or the chips starve. This tool measures what one host actually
delivers through the real loader path (cv2 decode, which releases the GIL,
on a thread pool — ``data/loaders.prefetch_items`` / ``batch_iterator``),
so deployment sizing is a measurement, not a guess.

Prints a JSON line per thread count: frames/sec decoded (RGB+IR pairs),
and the implied number of chips one host can feed at the bf16 and int8
serving rates.

Reference contrast: the torch reference decodes in DataLoader worker
*processes* (thermal_loader.py runs under num_workers forks); here decode
threads suffice because cv2.imdecode drops the GIL, and the arrays ship to
the device as raw uint8/uint16 (no per-worker float conversion).
"""

from __future__ import annotations

import io
import json
import os
import sys
import tempfile
import time

import numpy as np


def make_frames(tmpdir: str, n: int = 64):
    """Write n realistic 960x320 frame pairs (RGB uint8 + IR uint16)."""
    import cv2

    rs = np.random.RandomState(0)
    rgb_dir = os.path.join(tmpdir, "fl_rgb")
    ir_dir = os.path.join(tmpdir, "fl_ir_aligned")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(ir_dir, exist_ok=True)
    # natural-image-like content (smoothed noise) so PNG sizes are realistic
    for i in range(n):
        rgb = rs.randint(0, 255, (320, 960, 3), np.uint8)
        rgb = cv2.GaussianBlur(rgb, (0, 0), 3)
        ir = rs.randint(21000, 26000, (320, 960), np.uint16)
        ir = cv2.GaussianBlur(ir, (0, 0), 3)
        cv2.imwrite(os.path.join(rgb_dir, f"f_{i:04d}.png"), rgb)
        cv2.imwrite(os.path.join(ir_dir, f"f_{i:04d}.png"), ir)
    return rgb_dir, ir_dir


def bench_threads(rgb_dir: str, ir_dir: str, workers: int,
                  iters: int = 3) -> float:
    """Decode every RGB+IR pair ``iters`` times on a ``workers`` pool."""
    from concurrent.futures import ThreadPoolExecutor

    import cv2

    rgb_files = sorted(os.path.join(rgb_dir, f) for f in os.listdir(rgb_dir))
    ir_files = sorted(os.path.join(ir_dir, f) for f in os.listdir(ir_dir))

    def decode(pair):
        rgb = cv2.imread(pair[0], cv2.IMREAD_COLOR)
        ir = cv2.imread(pair[1], cv2.IMREAD_ANYDEPTH)
        return rgb.shape[0] + ir.shape[0]

    pairs = list(zip(rgb_files, ir_files)) * iters
    with ThreadPoolExecutor(max_workers=workers) as ex:
        t0 = time.perf_counter()
        total = sum(ex.map(decode, pairs))
        dt = time.perf_counter() - t0
    assert total == 640 * len(pairs)
    return len(pairs) / dt


def main() -> None:
    bf16_fps = 413.0   # bench.py headline, per chip
    int8_fps = 500.0
    with tempfile.TemporaryDirectory() as tmp:
        rgb_dir, ir_dir = make_frames(tmp)
        for workers in (1, 4, 8, 16, 32):
            fps = bench_threads(rgb_dir, ir_dir, workers)
            print(json.dumps({
                "decode_threads": workers,
                "host_cores": os.cpu_count(),
                "host_decode_fps": round(fps, 1),
                "chips_fed_bf16": round(fps / bf16_fps, 2),
                "chips_fed_int8": round(fps / int8_fps, 2),
            }))
            sys.stdout.flush()


if __name__ == "__main__":
    main()
