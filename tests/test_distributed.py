"""Multi-host runtime smoke test: 2 real processes over jax.distributed.

Covers parallel/distributed.py (initialize / global_mesh / is_main_process),
which models a TPU pod's per-host controller processes. Each subprocess hosts
2 virtual CPU devices, so the global mesh spans 4 devices across 2 processes;
the jitted psum rides the cross-process collective layer (the DCN analogue).
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2").strip()
sys.path.insert(0, {repo!r})
import numpy as np
import jax, jax.numpy as jnp
# sitecustomize registers the 'axon' TPU platform and pins jax_platforms;
# force CPU post-import exactly as tests/conftest.py does
jax.config.update("jax_platforms", "cpu")
from jax.sharding import NamedSharding, PartitionSpec as P

from hyperseg_tpu.parallel import distributed as D

assert D.initialize()  # from COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID
assert jax.device_count() == 4 and jax.local_device_count() == 2
mesh = D.global_mesh()
assert mesh.devices.size == 4

# data-parallel global array: each process contributes its local shard
sharding = NamedSharding(mesh, P("data"))
local = np.arange(2, dtype=np.float32) + 2 * jax.process_index()
garr = jax.make_array_from_process_local_data(sharding, local, global_shape=(4,))

@jax.jit
def total(x):
    return jnp.sum(x)  # GSPMD inserts the cross-process reduction

t = float(total(garr))
assert t == 0 + 1 + 2 + 3, t
if D.is_main_process():
    assert jax.process_index() == 0
print(f"proc {{jax.process_index()}}: ok total={{t}}", flush=True)
"""


def test_two_process_distributed_init(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo))

    procs = []
    for pid in range(2):
        env = {**os.environ,
               "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
               "NUM_PROCESSES": "2", "PROCESS_ID": str(pid)}
        env.pop("JAX_PLATFORMS", None)
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: ok total=6.0" in out, out
