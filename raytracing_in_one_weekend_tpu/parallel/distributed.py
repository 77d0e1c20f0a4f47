"""Multi-host orchestration.

The reference is single-process shared-memory (SURVEY.md section 2.7); the
TPU framework adds the missing distributed-communication layer:
jax.distributed process bootstrap, cross-host metric reduction, and host-0
image gather — DCN for cross-host, ICI within a slice, all via standard
XLA collectives (no custom transport).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed bootstrap.  On single-process runs this is a no-op;
    on multi-host pods the standard TPU environment auto-detects every
    argument (pass explicit values only for CPU/GPU clusters)."""
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # tolerate ONLY the already-initialized case; a misconfigured pod
        # must fail loudly, not silently degrade to single-process
        if "already" not in str(e).lower():
            raise


def is_primary_host() -> bool:
    return jax.process_index() == 0


def gather_image_to_host(image: jax.Array) -> np.ndarray | None:
    """Gather a (possibly sharded) device image to host 0 as numpy.

    Uses process_allgather semantics under the hood: every host receives
    the full image; non-primary hosts return None so only host 0 writes
    PNGs (the reference's SwapBuffers/save path, Raytracer.cs:997-1060).
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        image = multihost_utils.process_allgather(image, tiled=True)
    else:
        image = jax.device_get(image)
    return np.asarray(image) if is_primary_host() else None


def all_reduce_metrics(tree):
    """Cross-host scalar metric reduction (the reference's single-threaded
    ReduceMetricsJob becomes a psum over the mesh)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return jax.tree.map(
            lambda x: multihost_utils.process_allgather(jnp.asarray(x)).sum(),
            tree,
        )
    return tree
