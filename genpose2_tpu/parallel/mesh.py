"""Device-mesh sharding for data- and candidate-parallel execution.

The reference is single-GPU (nn.DataParallel at best,
reference: networks/posenet_agent.py:116-118; its gloo process group is dead
code, utils/misc.py:14-27). Here parallelism is mesh-native (SURVEY.md §2.8):

- axis 'data'  — objects/frames: batches are sharded along their leading axis;
  under jit, gradients all-reduce over ICI automatically (GSPMD inserts psum);
- axis 'cand'  — the domain-specific candidate axis: the K pose candidates per
  object sampled by the reverse ODE. Conditioning features are broadcast, so
  sharding candidates costs no collective traffic until ranking/aggregation
  (tiny K x K reductions).

Model parallelism (TP/PP/SP/EP) is deliberately ABSENT: the networks are
~4M-parameter MLP/attention stacks whose largest sequence is 512 points —
there is nothing to shard. The scaling axes of this workload are objects,
frames/streams, and candidates (see SURVEY.md §2.8); replicating parameters
and sharding those three axes is the roofline-optimal layout.

Multi-host: call jax.distributed.initialize() per host before make_mesh();
the same code then runs with per-host data shards (ICI within a slice, DCN
across slices) — no NCCL/MPI analog required.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 0, cand: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a (data x cand) mesh. data=0 means 'all remaining devices'."""
    devices = list(devices if devices is not None else jax.devices())
    if data == 0:
        data = len(devices) // cand
    use = np.asarray(devices[: data * cand]).reshape(data, cand)
    return Mesh(use, ("data", "cand"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place every array in the batch with its leading axis sharded on 'data'."""

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P("data")))

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters / train state) across the mesh.

    Multi-process: device_put cannot target non-addressable devices, so the
    global replicated array is assembled from the (identical) host-local
    value on every process."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_candidates(mesh: Mesh):
    """Sharding for (B, K, ...) candidate tensors: B on 'data', K on 'cand'."""
    return NamedSharding(mesh, P("data", "cand"))


def shard_stacked_batch(batches: dict, mesh: Mesh) -> dict:
    """Place a (S, B, ...) scan-stacked batch pytree with the BATCH axis
    (axis 1) sharded on 'data' — the layout consumed by
    PoseAgent.train_steps under a mesh."""

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P(None, "data")))

    return jax.tree.map(put, batches)
