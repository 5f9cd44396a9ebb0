"""Pytest setup: force CPU JAX with 8 virtual devices for sharding tests.

The axon TPU plugin ignores ``JAX_PLATFORMS`` from the environment, so we
must also set the config programmatically before any backend initializes.
Tests are deterministic on CPU; the real TPU chip is exercised by bench.py,
not the unit suite (and the chip is single-client — a test run must never
grab it, or it blocks concurrent benchmarking).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/rsb_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
