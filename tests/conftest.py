"""Test configuration: force an 8-device virtual CPU mesh so sharding tests
run without TPU hardware, and keep compilation deterministic.

The environment may register an out-of-process TPU PJRT plugin that overrides
``JAX_PLATFORMS`` at interpreter start, so the platform must be forced through
``jax.config`` before any backend initialisation.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NB: do NOT enable jax_compilation_cache_dir here — in this environment a
# remote-compile service produces CPU AOT artifacts for a different machine
# type, and reloading them SIGILLs the test process.
