"""Test config: force pure CPU with 8 virtual devices so sharding tests run
deterministically and fast, without touching TPU hardware.

Note: this environment registers an 'axon' TPU platform via sitecustomize
and pins JAX_PLATFORMS=axon, so the env var alone is not enough — the
config must be overridden after import, before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
