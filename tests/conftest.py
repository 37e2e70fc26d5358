"""Test configuration: force CPU with 8 virtual devices so sharding tests run anywhere.

The environment may pre-pin JAX_PLATFORMS to a TPU plugin (e.g. "axon"), so we
override via jax.config before any backend is initialized rather than relying
on environment variables.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
