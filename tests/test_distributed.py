"""Multi-process initialization smoke test: ``init_distributed`` really
drives ``jax.distributed.initialize`` (loopback, 2 local CPU processes)
and the resulting global device set runs a sharded collective.

The reference is single-node (SURVEY.md 5.8); this is the TPU-pod entry
(DCN across hosts) exercised the only way this 1-host environment can.
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tdnet_tpu.parallel.mesh import init_distributed, make_mesh

coord, pid = sys.argv[1], int(sys.argv[2])
n = init_distributed(coord, num_processes=2, process_id=pid)
assert n == 2, n
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

mesh = make_mesh(path_parallel=1)
assert dict(mesh.shape) == {"data": 4, "path": 1}
sh = NamedSharding(mesh, P("data"))
x = jax.make_array_from_callback(
    (8,), sh, lambda idx: jnp.arange(8.0)[idx])
total = jax.jit(lambda v: v.sum(), out_shardings=NamedSharding(mesh, P()))(x)
assert float(total) == 28.0, float(total)
print(f"proc {pid} ok", flush=True)
"""


@pytest.mark.slow
def test_init_distributed_two_processes(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.Popen([sys.executable, "-c", _CHILD, coord, str(i)],
                              cwd=repo, env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"proc {i} ok" in out
