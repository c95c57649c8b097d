"""Multi-host job coordination.

The reference's multi-machine story is a shared filesystem + randomized job
order + skip-if-output-exists (generate_..._multigpu.py:313-318).  Here,
multi-host runs get deterministic partitioning by JAX process index (pod
slices) or explicit shard arguments, with the same shared-FS idempotency as
the safety net.
"""

from __future__ import annotations

import os
import random


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """jax.distributed.initialize wrapper (no-op when single-process)."""
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_info():
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def partition_jobs(jobs, shard_index=None, num_shards=None, shuffle=False,
                   seed=0):
    """Deterministic strided partition of a job list across workers.

    With shuffle=True the full list is shuffled with a shared seed first so
    every worker computes the same permutation (heterogeneous fleets then
    load-balance via the skip-if-exists file cache)."""
    jobs = list(jobs)
    if shuffle:
        random.Random(seed).shuffle(jobs)
    if shard_index is None or num_shards is None:
        shard_index, num_shards = process_info()
    return jobs[shard_index::num_shards]


def is_primary():
    return process_info()[0] == 0


_BARRIER_GEN: dict = {}


def barrier_via_files(path, tag, timeout_s=3600):
    """Filesystem barrier for shared-FS fleets without jax.distributed.

    Safe to call repeatedly with the same tag — an internal generation
    counter namespaces each call (every process calls barriers in the
    same order, so generations agree).  Markers are never cleaned up
    (removal races the slowest waiter), so a barrier directory must be
    fresh per run: a pre-existing marker for THIS process raises instead
    of letting stale markers from a crashed previous run satisfy the
    count and silently skip synchronization."""
    import time

    idx, count = process_info()
    os.makedirs(path, exist_ok=True)
    gen = _BARRIER_GEN.get((path, tag), 0) + 1
    _BARRIER_GEN[(path, tag)] = gen
    full = "%s.g%d" % (tag, gen)
    marker = os.path.join(path, "%s.%d" % (full, idx))
    if os.path.exists(marker):
        raise RuntimeError(
            "stale barrier marker %s already exists — this barrier "
            "directory was used by a previous run; clear it (or use a "
            "fresh per-run path) before reusing" % marker)
    open(marker, "w").close()
    t0 = time.time()
    while True:
        done = sum(os.path.exists(os.path.join(path, "%s.%d" % (full, i)))
                   for i in range(count))
        if done >= count:
            return
        if time.time() - t0 > timeout_s:
            raise TimeoutError("barrier %s timed out (%d/%d)"
                               % (full, done, count))
        time.sleep(1.0)
