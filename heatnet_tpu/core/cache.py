"""Persistent XLA compilation cache setup.

On this TPU image compiles go through a remote-compile relay and a full
ResNeXt-50 forward takes minutes to compile the first time (measured ~285s
for jitted init during verification). The persistent cache makes every
subsequent process start in seconds, which matters for CLI tools and the
benchmark driver. Call :func:`enable_compilation_cache` before the first jit.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/heatnet_tpu_xla")


def enable_compilation_cache(cache_dir: str = _DEFAULT_DIR) -> str:
    import jax

    # per-platform subdirectory: CPU AOT entries record host machine
    # features and warn loudly when a TPU-session cache dir is reused
    # (observed "machine type ... doesn't match" spam during verification)
    try:
        platform = jax.default_backend()
    except Exception:
        platform = "unknown"
    cache_dir = os.path.join(cache_dir, platform)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:  # older jax
        pass
    return cache_dir
