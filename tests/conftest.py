"""Test config: force the CPU backend with 8 virtual devices.

Tests validate semantics/numerics on CPU (fast compiles, deterministic);
multi-chip sharding tests use the 8 virtual host devices.  TPU runs happen
via bench.py / __graft_entry__.py.

Note: the env var JAX_PLATFORMS is ignored when the axon TPU plugin is
present, so the platform is forced via jax.config here, before any backend
initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
