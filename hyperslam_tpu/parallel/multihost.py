"""Multi-host (multi-process) scaffolding for the distributed solvers.

The reference's "distribution" is a single-machine ROS process graph
(SURVEY.md §2.4/§5.8, ``module.cpp:45-67``, ``run.sh:11-22``).  The
TPU-native replacement is JAX multi-controller: every host process runs
the same program, ``jax.distributed.initialize`` wires the coordination
service, and one global ``Mesh`` spans all processes' devices — the
sharded solvers (``dist_ba``, ``time_ba``, ``condensed_ba``) then run
unchanged, with XLA routing their ``psum``/``ppermute`` over ICI within a
host and DCN across hosts.

Degenerate single-process use (this environment has one host) is the
N=1 path of the same code; the 2-process CPU parity gate lives in
``tools/multihost_run.py`` + ``tests/test_multihost.py``.

Weak-scaling protocol (BASELINE.md target: >=0.7 efficiency at >=2 hosts):
fix the per-host problem share (factors per host constant), grow the host
count, measure chained solves/s; efficiency = rate(N) / (N * rate(1)).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize", "global_mesh", "put_sharded", "put_replicated",
           "fetch_replicated"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-controller job (no-op for a single process).

    Arguments default to the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``) so launchers can configure via environment."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def global_mesh(axis: str, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over ALL devices of the job (across processes)."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis,))


def put_sharded(tree, mesh: Mesh, axis: str):
    """Place host arrays (identical on every process) sharded along their
    leading axis over the global mesh.  Works across processes: each
    process materializes only its addressable shards."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])
    return jax.tree.map(put, tree)


def put_replicated(tree, mesh: Mesh):
    """Place host arrays (identical on every process) fully replicated."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])
    return jax.tree.map(put, tree)


def fetch_replicated(tree):
    """Read fully-replicated results process-locally (first addressable
    shard — identical everywhere by construction)."""
    return jax.tree.map(
        lambda x: np.asarray(x.addressable_data(0))
        if hasattr(x, "addressable_data") else np.asarray(x), tree)
