"""Two-process jax.distributed smoke test (parallel/distributed.py).

The reference is single-process shared-memory; this framework's
multi-host layer (process bootstrap, host-0 image gather, metric
all-reduce) had no multi-process coverage before this test — it launches
TWO real CPU processes over the loopback DCN and exercises the actual
jax.distributed wire path, catching API drift before real pods.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, sys
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from raytracing_in_one_weekend_tpu.parallel import distributed

coord, pid = sys.argv[1], int(sys.argv[2])
distributed.initialize(
    coordinator_address=coord, num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid

# double-init must raise loudly (not silently degrade): the guard only
# forgives the already-initialized case itself
try:
    distributed.initialize(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
except RuntimeError:
    pass  # acceptable: re-raise path (message without 'already')

# host-0 image gather: each process contributes its process-local shard
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("tiles",))
n = 8 * len(jax.devices())
local = jax.jit(
    lambda: jax.numpy.arange(n, dtype=jax.numpy.float32),
    out_shardings=NamedSharding(mesh, P("tiles")),
)()
img = distributed.gather_image_to_host(local)
if distributed.is_primary_host():
    assert img is not None and img.shape == (n,), img
    np.testing.assert_array_equal(img, np.arange(n, dtype=np.float32))
else:
    assert img is None

# cross-host metric all-reduce
metrics = distributed.all_reduce_metrics(
    {"rays": jax.numpy.asarray(float(pid + 1))}
)
total = float(metrics["rays"])
assert total == 3.0, total  # 1 + 2

print(json.dumps({"pid": pid, "ok": True}))
"""


def test_two_process_dcn_roundtrip(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(pid)],
            cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=110)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err}"
        assert json.loads(out.strip().splitlines()[-1])["ok"]
