"""Multi-host (DCN) layering: 2 separate processes, each with 2 virtual CPU
devices, join through `initialize_distributed` (log_tpu/parallel/mesh.py) and
run a cross-process collective over the global 4-device mesh — the same
jax.distributed bootstrap a TPU pod uses over DCN (SURVEY.md §5.8)."""
import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from log_tpu.parallel.mesh import initialize_distributed

initialize_distributed()  # LOG_TPU_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

mesh = Mesh(np.asarray(jax.devices()), ("dp",))

def body():
    # sum of device ids across BOTH processes: 0+1+2+3 = 6
    return jax.lax.psum(
        jnp.float32(jax.lax.axis_index("dp")), "dp"
    ).reshape(1)

fn = jax.jit(
    shard_map(body, mesh=mesh, in_specs=(), out_specs=P()), out_shardings=None
)
out = fn()
val = float(np.asarray(out)[0])
assert val == 6.0, val
print(f"multihost OK pid={jax.process_index()} psum={val}", flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_init(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env_base = {
        k: v
        for k, v in os.environ.items()
        if not k.startswith(("XLA_", "JAX_"))
    }
    procs = []
    logs = []
    for pid in range(2):
        env = dict(env_base)
        env["LOG_TPU_COORDINATOR"] = f"127.0.0.1:{port}"
        env["LOG_TPU_NUM_PROCESSES"] = "2"
        env["LOG_TPU_PROCESS_ID"] = str(pid)
        log = open(tmp_path / f"proc{pid}.log", "w")
        logs.append(log)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _CHILD],
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                stdout=log,
                stderr=subprocess.STDOUT,
            )
        )
    rcs = [p.wait(timeout=240) for p in procs]
    for log in logs:
        log.close()
    outs = [(tmp_path / f"proc{i}.log").read_text() for i in range(2)]
    assert rcs == [0, 0], "\n".join(outs)
    for i, out in enumerate(outs):
        assert f"multihost OK pid={i} psum=6.0" in out, out
