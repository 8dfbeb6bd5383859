"""Ball query: for each centroid, the first ``nsample`` point indices (in index
order) whose squared distance is < radius^2, padded with the first hit.

Semantics exactly match the reference CUDA kernel
(reference: networks/pts_encoder/pointnet2_utils/pointnet2/src/ball_query_gpu.cu:9-45):
- hits are collected in ascending point-index order, strictly ``d2 < r^2``;
- when the first hit is found, ALL slots are pre-filled with it, so rows with
  fewer than ``nsample`` hits are padded with the first hit;
- rows with zero hits return all-zero indices (the output is zero-initialized).

The padding rule is load-bearing for parity: it changes the grouped feature
statistics (max-pool over duplicated first-hit rows), so an approximate
nearest-k would not reproduce the reference encoder.

Formulation: a cumulative-sum ranks hits in index order; slot ``s`` holds the
unique point whose hit-rank is ``s+1``. This is dense, vectorized, and
deterministic. The full (B, M, N) distance tensor is processed in batch chunks
(``lax.map``) to bound memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _ball_query_chunk(xyz, new_xyz, radius: float, nsample: int):
    """xyz (b, N, 3), new_xyz (b, M, 3) -> idx (b, M, nsample) int32.

    Dense masked-reduction formulation: slot s holds the unique point whose
    hit-rank is s+1, extracted with one masked sum per slot. nsample passes of
    O(M*N) VPU work — measured ~8x faster end-to-end than an XLA scatter
    formulation on TPU (scatters serialize on TPU; dense reductions pipeline).
    """
    d2 = jnp.sum((new_xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, axis=-1)  # (b,M,N)
    mask = d2 < radius * radius
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1)  # 1-based rank at hit positions
    cnt = rank[..., -1]  # (b, M)
    lane = jax.lax.broadcasted_iota(jnp.int32, mask.shape, dimension=2)

    def slot_index(s):
        hit_s = mask & (rank == s + 1)  # at most one True per row
        return jnp.sum(jnp.where(hit_s, lane, 0), axis=-1)  # (b, M)

    idx = jnp.stack([slot_index(s) for s in range(nsample)], axis=-1)  # (b, M, S)
    first = idx[..., 0:1]
    slots = jnp.arange(nsample, dtype=jnp.int32)
    idx = jnp.where(cnt[..., None] > slots, idx, first)
    return idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def ball_query(
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    radius: float,
    nsample: int,
    chunk: int = 16,
    use_pallas: bool | None = None,
):
    """xyz (B, N, 3), new_xyz (B, M, 3) -> (B, M, nsample) int32 indices.

    Dispatches to the VMEM-resident Pallas kernel on TPU
    (genpose2_tpu/ops/ball_query_pallas.py) and the chunked XLA formulation
    on CPU (identical semantics, both oracle-tested)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        from genpose2_tpu.ops.ball_query_pallas import ball_query_pallas

        return ball_query_pallas(xyz, new_xyz, radius, nsample)
    B = xyz.shape[0]
    xyz = jax.lax.stop_gradient(xyz).astype(jnp.float32)
    new_xyz = jax.lax.stop_gradient(new_xyz).astype(jnp.float32)
    if B <= chunk:
        return _ball_query_chunk(xyz, new_xyz, radius, nsample)
    # pad to a multiple of chunk and map over chunks to bound the (b, M, N)
    # distance tensor's live size
    Bp = ((B + chunk - 1) // chunk) * chunk
    if Bp != B:
        xyz = jnp.pad(xyz, ((0, Bp - B), (0, 0), (0, 0)))
        new_xyz = jnp.pad(new_xyz, ((0, Bp - B), (0, 0), (0, 0)))
    xyz_c = xyz.reshape(Bp // chunk, chunk, *xyz.shape[1:])
    new_c = new_xyz.reshape(Bp // chunk, chunk, *new_xyz.shape[1:])
    out = jax.lax.map(
        lambda ab: _ball_query_chunk(ab[0], ab[1], radius, nsample), (xyz_c, new_c)
    )
    return out.reshape(Bp, new_xyz.shape[1], nsample)[:B]
