"""Pallas ball-query kernel: VMEM-resident distance/rank/extraction.

The XLA formulation (genpose2_tpu/ops/ball_query.py) is algebraically the
same computation but materializes the (B, M, N) distance/mask/rank tensors in
HBM and re-reads them for every of the ``nsample`` slot-extraction passes.
This kernel computes an (RB, TM, N) tile of distances in VMEM and runs all
passes there — HBM traffic drops to reading xyz once per tile plus writing
the (RB, TM, S) indices.

The rank (1-based hit order) is computed as a lower-triangular matmul on the
MXU (rank = mask @ L with L[j, k] = j <= k), which is faster and more
portable inside Mosaic than a lane-dimension cumsum.

Mosaic tiling constraints: the kernel processes RB=8 batch rows per program
(sublane multiple) and TM centroids; the output block's last axis equals the
full ``nsample`` axis.

Semantics identical to the CUDA reference (ball_query_gpu.cu:9-45): first
``nsample`` in-radius indices in ascending order, padded with the first hit,
all-zeros when no hit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RB = 8  # batch rows per program (f32 sublane tile)


def blocked_prefix_rank(mask2: "jnp.ndarray") -> "jnp.ndarray":
    """In-kernel lane-axis prefix sum of a 0/1 mask (R, N) -> f32 rank (R, N),
    rank[r, k] = #ones with index <= k.

    Blocked triangular matmul: per 128-lane block, within-block rank =
    mask_blk @ tri128 (tri128[j,k] = j <= k) plus the running count of all
    previous blocks — R*N*128 FLOPs instead of the naive R*N*N full-triangular
    product (8x fewer at N=1024). Counts <= N are exact in the f32 accumulator
    with bf16 0/1 operands. Shared by the ball-query and fused-SA kernels.
    """
    R, N = mask2.shape
    assert N % 128 == 0, N  # caller pads
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (128, 128), dimension=0)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (128, 128), dimension=1)
    tri = (r_ids <= c_ids).astype(jnp.bfloat16)
    pieces = []
    off = jnp.zeros((R, 1), jnp.float32)
    for blk in range(N // 128):
        m_blk = mask2[:, blk * 128 : (blk + 1) * 128].astype(jnp.bfloat16)
        within = jnp.dot(m_blk, tri, preferred_element_type=jnp.float32)
        pieces.append(within + off)
        off = off + within[:, 127:128]
    return jnp.concatenate(pieces, axis=1)



def _pad_and_split(xyz, new_xyz, row_tile):
    """Shared prologue for the centroid-tiled kernels: stop-gradient + f32,
    Mosaic-compatible tiling (TM lane rule, RB batch rows, N lane padding with
    far-away points), and per-coordinate splits.

    Returns (x, y, z, cx, cy, cz, grid, specs, dims) where specs =
    (pts_spec, ctr_spec) and dims = (B, M, N, Bp, Mp, Np, TM)."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    xyz = jax.lax.stop_gradient(xyz).astype(jnp.float32)
    new_xyz = jax.lax.stop_gradient(new_xyz).astype(jnp.float32)

    TM = min(row_tile, M)
    # centers block must satisfy Mosaic lane tiling: TM % 128 == 0 or TM == M
    if TM % 128 != 0 and TM != M:
        TM = M if M < 128 else 128
    Bp = ((B + _RB - 1) // _RB) * _RB
    Mp = ((M + TM - 1) // TM) * TM
    Np = ((N + 127) // 128) * 128
    if Bp != B:
        xyz = jnp.pad(xyz, ((0, Bp - B), (0, 0), (0, 0)))
        new_xyz = jnp.pad(new_xyz, ((0, Bp - B), (0, 0), (0, 0)))
    if Mp != M:
        new_xyz = jnp.pad(new_xyz, ((0, 0), (0, Mp - M), (0, 0)))
    if Np != N:
        # padded points pushed far away AND masked by n_valid
        xyz = jnp.pad(xyz, ((0, 0), (0, Np - N), (0, 0)), constant_values=1e9)

    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    cx, cy, cz = new_xyz[..., 0], new_xyz[..., 1], new_xyz[..., 2]
    grid = (Bp // _RB, Mp // TM)
    pts_spec = pl.BlockSpec((_RB, Np), lambda b, m: (b, 0), memory_space=pltpu.VMEM)
    ctr_spec = pl.BlockSpec((_RB, TM), lambda b, m: (b, m), memory_space=pltpu.VMEM)
    return x, y, z, cx, cy, cz, grid, (pts_spec, ctr_spec), (B, M, N, Bp, Mp, Np, TM)


def _bq_kernel(x_ref, y_ref, z_ref, cx_ref, cy_ref, cz_ref, out_ref, *, radius, nsample, n_valid):
    RB, N = x_ref.shape
    TM = cx_ref.shape[1]
    x = x_ref[:, :][:, None, :]  # (RB, 1, N)
    y = y_ref[:, :][:, None, :]
    z = z_ref[:, :][:, None, :]
    cx = cx_ref[:, :][:, :, None]  # (RB, TM, 1)
    cy = cy_ref[:, :][:, :, None]
    cz = cz_ref[:, :][:, :, None]

    d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2  # (RB, TM, N)
    lane = jax.lax.broadcasted_iota(jnp.int32, (RB, TM, N), dimension=2)
    maskf = ((d2 < radius * radius) & (lane < n_valid)).astype(jnp.float32)

    rank = blocked_prefix_rank(maskf.reshape(RB * TM, N)).reshape(RB, TM, N)
    # ranksel: hit-rank at hit positions, 0 elsewhere — the only live (.., N)
    # tensor the extraction loop needs besides the lane iota
    ranksel = (rank * maskf).astype(jnp.int32)
    cnt = jnp.sum(maskf, axis=2).astype(jnp.int32)  # (RB, TM)

    first = jnp.sum(jnp.where(ranksel == 1, lane, 0), axis=2)  # (RB, TM)

    # unrolled slot extraction with a direct static-index store per slot:
    # each (RB, TM, N) temporary dies immediately (keeping them alive for a
    # final stack blows the Mosaic scoped-VMEM stack)
    for s in range(nsample):
        idx_s = jnp.sum(jnp.where(ranksel == s + 1, lane, 0), axis=2)  # (RB, TM)
        out_ref[:, :, s] = jnp.where(cnt > s, idx_s, first)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def ball_query_pallas(
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    radius: float,
    nsample: int,
    row_tile: int = 128,
):
    """xyz (B, N, 3), new_xyz (B, M, 3) -> (B, M, nsample) int32."""
    x, y, z, cx, cy, cz, grid, (pts_spec, ctr_spec), (B, M, N, Bp, Mp, _, TM) = (
        _pad_and_split(xyz, new_xyz, row_tile)
    )
    out = pl.pallas_call(
        functools.partial(_bq_kernel, radius=radius, nsample=nsample, n_valid=N),
        grid=grid,
        in_specs=[pts_spec, pts_spec, pts_spec, ctr_spec, ctr_spec, ctr_spec],
        out_specs=pl.BlockSpec(
            (_RB, TM, nsample), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Mp, nsample), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(x, y, z, cx, cy, cz)
    return out[:B, :M]


def _ball_count_kernel(x_ref, y_ref, z_ref, cx_ref, cy_ref, cz_ref, out_ref, *, radius, n_valid):
    RB, N = x_ref.shape
    x = x_ref[:, :][:, None, :]
    y = y_ref[:, :][:, None, :]
    z = z_ref[:, :][:, None, :]
    cx = cx_ref[:, :][:, :, None]
    cy = cy_ref[:, :][:, :, None]
    cz = cz_ref[:, :][:, :, None]
    d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2  # (RB, TM, N)
    lane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, dimension=2)
    hit = (d2 < radius * radius) & (lane < n_valid)
    out_ref[:, :] = jnp.sum(hit.astype(jnp.float32), axis=2).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(2, 3))
def ball_count(
    xyz: jnp.ndarray, new_xyz: jnp.ndarray, radius: float, row_tile: int = 128
):
    """Number of in-radius points per centroid: xyz (B, N, 3), new_xyz
    (B, M, 3) -> (B, M) int32. Used by the eval fast path to ORDER centroids
    by hit density so the fused SA kernel's dynamic chunk skip fires
    per-tile (a pure performance permutation; results are centroid-order
    independent)."""
    x, y, z, cx, cy, cz, grid, (pts_spec, ctr_spec), (B, M, N, Bp, Mp, _, _TM) = (
        _pad_and_split(xyz, new_xyz, row_tile)
    )
    out = pl.pallas_call(
        functools.partial(_ball_count_kernel, radius=radius, n_valid=N),
        grid=grid,
        in_specs=[pts_spec, pts_spec, pts_spec, ctr_spec, ctr_spec, ctr_spec],
        out_specs=ctr_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, Mp), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(x, y, z, cx, cy, cz)
    return out[:B, :M]
