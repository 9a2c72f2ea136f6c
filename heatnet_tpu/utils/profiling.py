"""Tracing / profiling hooks (SURVEY.md §5 rebuild).

The reference's only instrumentation is wall-clock AverageMeters
(scripts/main.py:215-217,261-262) and a CUDA-synchronized forward timer
(scripts/inference.py:125-131). Rebuilt TPU-native:

- :class:`StepTimer` — batch/data wall-clock meters with the reference's
  metric names, plus steps/sec.
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory (XLA op-level timeline on TPU).
- :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so host
  phases (decode, augment, step) show up on the trace.

NOTE (this environment): per-call host timing through the remote-execution
relay is unreliable (``block_until_ready`` may return before execution and
round-trip constants dominate). For kernel timing use
:func:`scan_benchmark`, which runs N iterations inside one jit and
differences two iteration counts — constants cancel exactly.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

from ..io.logging import AverageMeter


class StepTimer:
    """batch_time / data_time meters (scripts/main.py naming)."""

    def __init__(self):
        self.batch_time = AverageMeter()
        self.data_time = AverageMeter()
        self._end = time.time()

    def data_loaded(self):
        self.data_time.update(time.time() - self._end)

    def step_done(self):
        now = time.time()
        self.batch_time.update(now - self._end)
        self._end = now

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self.batch_time.avg if self.batch_time.avg else 0.0

    def log_dict(self, prefix: str = "") -> dict:
        return {
            f"{prefix}batch_time": self.batch_time.avg,
            f"{prefix}data_time": self.data_time.avg,
            f"{prefix}steps_per_sec": self.steps_per_sec,
        }


@contextlib.contextmanager
def trace(log_dir: str = "profile"):
    """``jax.profiler`` trace context (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-span annotation visible in the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def scan_benchmark(step_fn: Callable, example_args, n_small: int = 5,
                   n_large: int = 25, reps: int = 3) -> float:
    """Seconds per call of ``step_fn(*example_args)`` measured on device.

    Runs the function ``n`` times inside one jitted ``lax.scan`` (data
    dependence threaded through a scalar carry so iterations cannot be
    elided), reads one scalar back, and differences two scan lengths so
    dispatch/transfer constants cancel.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    def timed(n: int) -> float:
        @jax.jit
        def run(args):
            def body(carry, _):
                # thread the carry into the inputs so iterations are truly
                # sequential — otherwise XLA hoists the loop-invariant call
                # out of the scan and T(n) is flat in n (observed live)
                args2 = jax.tree_util.tree_map(
                    lambda a: (a + carry.astype(a.dtype))
                    if jnp.issubdtype(a.dtype, jnp.floating) else a, args)
                out = step_fn(*args2)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return (carry + jnp.mean(leaf).astype(jnp.float32) * 1e-9,
                        None)

            carry, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
            return carry

        float(run(example_args))  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            float(run(example_args))
        return (time.perf_counter() - t0) / reps

    t_small, t_large = timed(n_small), timed(n_large)
    return max((t_large - t_small) / (n_large - n_small), 1e-12)
