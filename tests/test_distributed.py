"""Real 2-process jax.distributed smoke test (CPU backend).

Launches two fresh Python processes that jax.distributed.initialize
against a local coordinator, partition a job table by process index, run
a psum across hosts, and synchronize through the shared-FS barrier — the
production multi-host story of xfr_tpu.parallel.distributed (the
reference's analog is --shuffle + shared FS,
generate_..._multigpu.py:313-318).
"""

import os
import socket
import subprocess
import sys
import tempfile

WORKER = r"""
import os, sys
# each process is its own single-CPU jax host; the axon sitecustomize
# overrides JAX_PLATFORMS from the environment, so force cpu in-Python
os.environ.pop("XLA_FLAGS", None)
import jax
jax.config.update("jax_platforms", "cpu")

from xfr_tpu.parallel.distributed import (barrier_via_files, initialize,
                                          is_primary, partition_jobs,
                                          process_info)

coord, pid, nprocs, outdir = sys.argv[1:5]
initialize(coordinator_address=coord, num_processes=int(nprocs),
           process_id=int(pid))
assert jax.process_count() == int(nprocs), jax.process_count()
assert jax.process_index() == int(pid)
assert len(jax.devices()) == int(nprocs)  # one cpu device per host

# deterministic job partition by process index
jobs = partition_jobs(list(range(10)), shuffle=True, seed=7)
with open(os.path.join(outdir, "jobs.%s" % pid), "w") as f:
    f.write(",".join(map(str, jobs)))

# a real cross-host collective: global psum over per-host values
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import jax.numpy as jnp
import numpy as np
mesh = Mesh(np.asarray(jax.devices()), ("dp",))
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp")),
    np.asarray([float(pid) + 1.0], np.float32), (int(nprocs),))
total = jax.jit(lambda a: jnp.sum(a),
                out_shardings=NamedSharding(mesh, P()))(arr)
expect = sum(range(1, int(nprocs) + 1))
assert float(total) == expect, (float(total), expect)

barrier_via_files(outdir, "done", timeout_s=120)
if is_primary():
    with open(os.path.join(outdir, "primary.txt"), "w") as f:
        f.write("psum=%f" % float(total))
print("worker", pid, "ok")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_jax_distributed():
    nprocs = 2
    coord = "127.0.0.1:%d" % _free_port()
    with tempfile.TemporaryDirectory() as outdir:
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
        procs = [subprocess.Popen(
                    [sys.executable, "-c", WORKER, coord, str(pid),
                     str(nprocs), outdir],
                    stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                    env=env)
                 for pid in range(nprocs)]
        outs = [p.communicate(timeout=300)[0].decode() for p in procs]
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-3000:]

        # partitions are disjoint and cover the job table
        parts = [open(os.path.join(outdir, "jobs.%d" % i)).read().split(",")
                 for i in range(nprocs)]
        flat = sorted(int(x) for part in parts for x in part)
        assert flat == list(range(10))
        assert set(parts[0]).isdisjoint(parts[1])

        # primary wrote the psum result after the FS barrier
        assert open(os.path.join(outdir, "primary.txt")).read() == \
            "psum=3.000000"
