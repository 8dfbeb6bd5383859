"""Multi-host initialization and scaling harness.

reference counterpart: utils/misc.py:14-27 — a gloo process group that is
never invoked. Here multi-host is the standard JAX recipe: one
``jax.distributed.initialize()`` per host process, then the SAME mesh code as
single-host (collectives ride ICI within a slice, DCN across slices; no
NCCL/MPI analog). Data loading is per-host: each host feeds its local shard
of the global batch (``host_local_slice``).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID). No-op when
    single-process."""
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address or os.environ["COORDINATOR_ADDRESS"],
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ["PROCESS_ID"]),
    )
    return True


def host_local_slice(global_batch_size: int) -> slice:
    """The slice of the global batch this host should load."""
    per_host = global_batch_size // jax.process_count()
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def global_batch_from_host_local(local_batch, mesh, spec=None):
    """Assemble a globally-sharded batch from per-host local arrays
    (jax.make_array_from_process_local_data over the 'data' axis).

    ``spec``: PartitionSpec for every leaf; defaults to P('data') (leading
    batch axis). Scan-stacked (S, B, ...) chunks pass P(None, 'data')."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data") if spec is None else spec)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        local_batch,
    )
