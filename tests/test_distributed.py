"""Multi-host (DCN) smoke: REAL 2-process jax.distributed on CPU.

tests/test_parallel.py exercises the sharded step on a virtual 8-device
mesh inside one process; this test proves the cross-PROCESS path —
parallel/distributed.initialize, the process-spanning ('time', 'chan')
global mesh, and a halo exchange + psum whose collectives cross the
process boundary (the DCN analogue on this single host).
"""

import socket
import subprocess
import sys

_WORKER = r'''
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from amps_tpu.parallel import distributed as dist
from amps_tpu.parallel.halo import halo_exchange_left
from jax.sharding import PartitionSpec as P
from jax import shard_map
import jax.numpy as jnp

pid = int(sys.argv[1])
dist.initialize("127.0.0.1:" + sys.argv[2], 2, pid)
assert jax.process_count() == 2
assert jax.device_count() == 4, jax.devices()
mesh = dist.global_mesh()
assert dict(mesh.shape) == {{"time": 2, "chan": 2}}
assert dist.is_coordinator() == (pid == 0)

def f(x):
    xe = halo_exchange_left(x, 3, "time", 1)
    return jax.lax.psum(jnp.sum(xe), ("time", "chan"))

n = 16
x = jnp.arange(2 * n * 2, dtype=jnp.float32).reshape(2, n * 2)
g = jax.jit(shard_map(f, mesh=mesh, in_specs=(P("time", "chan"),),
                      out_specs=P()))
s = float(np.asarray(jax.device_get(g(x))).ravel()[0])
print("PSUM", pid, s, flush=True)
'''


def test_two_process_distributed_mesh_and_collectives(tmp_path):
    import pathlib
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen([sys.executable, str(script), str(i),
                               str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    # x = arange(64).reshape(2, 32), shards (1, 16); time-1 shards gain
    # their time-0 neighbor's last-3-column halo (42 and 90), time-0
    # shards a zero halo: psum = 2016 + 132
    for out in outs:
        assert "2148.0" in out, out[-2000:]
