"""Multi-host setup: jax.distributed + a global mesh spanning hosts.

The reference is single-process (SURVEY.md section 2.4). For pod-scale BA the
same point/observation sharding of parallel/sharded.py runs over a mesh that
spans hosts: the per-trial collective payload is one psum of the (9N, 9N)
reduced camera system (~21 MB at N=257) + scalars, riding ICI within a slice
and DCN across slices — camera state is replicated so no per-obs traffic
crosses hosts.

Usage (one process per host, standard JAX multi-process convention):

    from bundleadjustment_benchmarks_tpu.parallel import multihost, sharded
    multihost.initialize()                  # env-driven (TPU pods: automatic)
    mesh = multihost.global_mesh()          # 1-D mesh over ALL devices
    sp = sharded.shard_problem(problem, mesh)
    result = sharded.minimize_sharded(sp, mesh, mode="qrchol")

Every process must build the problem identically (same BAL file) —
shard_problem lays out global arrays deterministically, and jax.device_put
with a NamedSharding places only the local shards on local devices.

This module cannot be exercised on single-host CI; the mesh/collective code
it feeds IS tested on the virtual 8-device CPU mesh (tests/test_sharded.py),
which exercises identical psum/all_gather patterns.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from jax.sharding import Mesh

from bundleadjustment_benchmarks_tpu.parallel.sharded import AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-driven defaults.

    On TPU pods all arguments are discovered automatically; on other
    platforms pass them explicitly (or set JAX_COORDINATOR_ADDRESS etc.).
    Safe to call when already initialized (no-op).
    """
    # NOTE: must not probe jax.process_count() here — that call initializes
    # the local backend, after which jax.distributed.initialize refuses to
    # run (observed: silent single-host fallback in the 2-process CPU test).
    if jax.distributed.is_initialized():
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # Single-process run (no coordinator configured): proceed single-host.
        pass


def global_mesh(axis: str = AXIS) -> Mesh:
    """1-D mesh over all devices of all processes (data/point sharding axis).

    Device order follows jax.devices(), which groups by process — contiguous
    point ranges land within a host, so the heavy gram work never crosses
    DCN; only the psum of the reduced system does.
    """
    return Mesh(np.array(jax.devices()), (axis,))


def is_coordinator() -> bool:
    """True on the process that should print/checkpoint (process 0)."""
    return jax.process_index() == 0
