"""Simulated multi-node smoke test: 2 OS processes form a jax.distributed
cluster over localhost (the DCN path `train.py` wires via
`jax.distributed.initialize`; reference trains multi-node through
PTL/torchrun — SURVEY §2.9). Each process contributes its CPU devices to a
global mesh; a data-parallel psum must see every process's contribution.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
flags = " ".join(f for f in flags.split() if "host_platform_device_count" not in f)
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()  # 2 procs x 2 local devices

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
# process-local shard: each process contributes [2, 4] rows valued (pid+1)
local = np.full((2, 4), float(pid + 1), np.float32)
garr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))

@jax.jit
def total(x):
    return x.sum()

out = float(total(garr))
# rows: procs 0 and 1 contribute 2*4 elements each of value 1 and 2
assert out == 2 * 4 * 1.0 + 2 * 4 * 2.0, out
print(f"proc {pid}: global sum {out} over {jax.device_count()} devices OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_jax_distributed(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [
        subprocess.Popen([sys.executable, str(script), coord, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert "OK" in out
