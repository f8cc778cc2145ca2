"""Real 2-process jax.distributed exercise of initialize_multihost.

The no-env noop path is covered in test_aux; this actually boots a
2-process CPU jax.distributed job (coordinator + worker subprocesses),
runs a cross-process psum over the global mesh, and checks both
processes agree — the multi-host bootstrap the reference delegates to
ROS/NCCL-less single-host execution and this framework delegates to
jax.distributed (parallel/multihost.py).
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path = [p for p in sys.path if ".axon_site" not in p]

from dpg_slam_tpu.parallel.multihost import initialize_multihost, global_mesh

ok = initialize_multihost()
assert ok, "initialize_multihost should return True with env set"
assert jax.process_count() == 2, jax.process_count()

import jax.numpy as jnp
import jax.experimental.multihost_utils
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = global_mesh()
n = mesh.devices.size
assert n == 2, f"global mesh should span both processes, got {n}"
axis = mesh.axis_names[0]

# One shard per process; psum across the mesh must see both contributions.
x = jnp.asarray([float(jax.process_index()) + 1.0])  # proc0 -> 1, proc1 -> 2
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(axis)), x, (2,)
)
total = jax.jit(
    jax.shard_map(
        lambda a: jax.lax.psum(a, axis), mesh=mesh, in_specs=P(axis), out_specs=P()
    )
)(arr)
# Replicated output: every process holds an addressable replica shard.
local = float(total.addressable_shards[0].data[0])
assert local == 3.0, local
print(f"proc{jax.process_index()} OK psum={local}", flush=True)
"""


def test_two_process_distributed_psum(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=addr,
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _CHILD],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                cwd=repo,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"proc{pid} OK psum=3.0" in out, out
