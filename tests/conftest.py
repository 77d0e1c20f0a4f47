"""Test config: force pure CPU with 8 virtual devices so sharding tests run
deterministically and fast, without touching TPU hardware.

Note: this environment registers an 'axon' TPU platform via sitecustomize
and pins JAX_PLATFORMS=axon, so the env var alone is not enough — the
config must be overridden after import, before first backend use.
"""

import os
import resource

# The XLA CPU compiler segfaulted deterministically ~190 tests into the
# suite (test_replay's wavefront-grad jit, inside
# backend_compile_and_load) while the same compile succeeds standalone —
# the 8 MiB default main-thread stack is marginal for LLVM's recursive
# passes once the process is warm.  Let the main stack grow to the hard
# limit before jax loads.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY:
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))
    except (ValueError, OSError):  # pragma: no cover
        pass

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_live_executables_between_modules():
    """The XLA CPU backend segfaults inside backend_compile_and_load on
    big jits once the process carries a few hundred tests' worth of live
    executables (round 2 hit it ~190 tests in at test_replay's
    wavefront-grad jit; round 4 at test_replay's aux-kind grad jits —
    always in full-suite runs only, never standalone).  The round-2 fix
    cleared caches immediately before the single biggest compile; the
    suite has since grown more big-compile sites, so drop live
    executables at every module boundary instead."""
    jax.clear_caches()
    yield
