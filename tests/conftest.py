"""Test configuration: force a virtual 8-device CPU backend.

The reference has no automated tests (SURVEY.md §4); this suite is built from
scratch. Multi-device behavior is tested on the idiomatic JAX "fake backend":
8 host-platform devices, which exercises the same Mesh/sharding/collective
code paths the TPU pod runs.

Gotcha: in the TPU image, ``sitecustomize`` registers the ``axon`` PJRT
plugin at interpreter start and pins the platform, so the ``JAX_PLATFORMS``
*environment variable* is ignored. ``jax.config.update("jax_platforms", …)``
after import still wins — but ``XLA_FLAGS`` must be set before the CPU
backend is first initialized, hence this runs at conftest import time,
before any test module imports jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
