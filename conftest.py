"""Pytest setup: force CPU JAX with 8 virtual devices for sharding tests.

The axon TPU plugin ignores ``JAX_PLATFORMS`` from the environment, so we
must also set the config programmatically before any backend initializes.
Tests are deterministic on CPU; the real TPU chip is exercised by bench.py,
not the unit suite (and the chip is single-client — a test run must never
grab it, or it blocks concurrent benchmarking).
"""

import os

# Unconditional: the ambient environment may carry JAX_PLATFORMS=axon
# (the chip).  Tests must never see it, and subprocesses must inherit cpu.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

from reference_seal_backend_tpu.utils import jaxcfg  # noqa: E402

jaxcfg.setup()  # persistent compile cache (reads JAX_PLATFORMS — now cpu)
jax.config.update("jax_platforms", "cpu")
