"""Test environment: force CPU backend with 8 virtual devices.

The ambient environment pins JAX_PLATFORMS=axon (tunneled TPU) and a
sitecustomize imports jax at interpreter start, so env vars alone are too
late — the platform must be overridden through jax.config. XLA_FLAGS is
still honoured because the CPU client initialises lazily on first use.
Multi-chip sharding (SURVEY.md §2.10) is exercised on this virtual mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
