"""Furthest point sampling on TPU.

Semantics match the reference CUDA kernel
(reference: networks/pts_encoder/pointnet2_utils/pointnet2/src/sampling_gpu.cu:93-253):
the first selected index is 0; each subsequent pick maximizes the squared
distance to the nearest already-selected point, with the running min-distance
array updated incrementally. Ties resolve to the lowest index (the CUDA tree
reduction leaves ties unspecified; with float data they are measure-zero).

Two implementations with identical semantics:

- ``fps_ref``   — pure jnp ``lax.fori_loop``; XLA keeps the (B, N) state
  on-device but round-trips it through HBM every iteration.
- ``fps_pallas`` — a Pallas kernel that keeps the coordinates and min-distance
  array resident in VMEM across all M iterations (the op is inherently
  sequential in M — the win is eliminating per-iteration HBM traffic, not
  parallelism). The whole batch is processed vectorially inside the kernel;
  the per-row dynamic coordinate lookup is a one-hot contraction, which maps
  onto the VPU (TPUs have no per-lane gather).

The op has no gradient (sampling indices are discrete),
matching reference: pointnet2_utils.py:39-41.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10


# ---------------------------------------------------------------------------
# jnp reference implementation
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnums=(1,))
def fps_ref(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """xyz (B, N, 3) float -> (B, npoint) int32 sample indices."""
    B, N, _ = xyz.shape
    xyz = jax.lax.stop_gradient(xyz).astype(jnp.float32)

    def body(j, state):
        temp, old, out = state
        p_old = jnp.take_along_axis(xyz, old[:, None, None], axis=1)  # (B, 1, 3)
        d = jnp.sum((xyz - p_old) ** 2, axis=-1)  # (B, N)
        temp = jnp.minimum(temp, d)
        new = jnp.argmax(temp, axis=-1).astype(jnp.int32)  # (B,)
        out = jax.lax.dynamic_update_slice(out, new[:, None], (0, j))
        return temp, new, out

    temp0 = jnp.full((B, N), _BIG, jnp.float32)
    out0 = jnp.zeros((B, npoint), jnp.int32)
    old0 = jnp.zeros((B,), jnp.int32)
    _, _, out = jax.lax.fori_loop(1, npoint, body, (temp0, old0, out0))
    return out


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------
def _fps_kernel(x_ref, y_ref, z_ref, out_ref, temp_ref, npoint: int):
    TB, N = x_ref.shape
    x = x_ref[:, :]
    y = y_ref[:, :]
    z = z_ref[:, :]
    temp_ref[:, :] = jnp.full((TB, N), _BIG, jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, N), dimension=1)

    # first pick is index 0 for every row
    out_ref[0, :] = jnp.zeros((TB,), jnp.int32)
    x1 = x[:, 0:1]
    y1 = y[:, 0:1]
    z1 = z[:, 0:1]

    def body(j, carry):
        x1, y1, z1 = carry
        d = (x - x1) ** 2 + (y - y1) ** 2 + (z - z1) ** 2
        temp = jnp.minimum(temp_ref[:, :], d)
        temp_ref[:, :] = temp
        # row-wise argmax (first max index)
        best = jnp.max(temp, axis=1, keepdims=True)
        is_best = temp == best
        new = jnp.min(jnp.where(is_best, lane, N), axis=1).astype(jnp.int32)  # (TB,)
        out_ref[pl.ds(j, 1), :] = new[None, :]
        onehot = (lane == new[:, None]).astype(jnp.float32)
        x1 = jnp.sum(x * onehot, axis=1, keepdims=True)
        y1 = jnp.sum(y * onehot, axis=1, keepdims=True)
        z1 = jnp.sum(z * onehot, axis=1, keepdims=True)
        return x1, y1, z1

    jax.lax.fori_loop(1, npoint, body, (x1, y1, z1))


@functools.partial(jax.jit, static_argnums=(1, 2))
def fps_pallas(xyz: jnp.ndarray, npoint: int, row_tile: int = 128) -> jnp.ndarray:
    """xyz (B, N, 3) -> (B, npoint) int32, VMEM-resident min-distance state."""
    B, N, _ = xyz.shape
    xyz = jax.lax.stop_gradient(xyz).astype(jnp.float32)
    TB = min(row_tile, B)
    # pad batch to a multiple of the row tile
    Bp = ((B + TB - 1) // TB) * TB
    if Bp != B:
        xyz = jnp.pad(xyz, ((0, Bp - B), (0, 0), (0, 0)))
    x = xyz[..., 0]
    y = xyz[..., 1]
    z = xyz[..., 2]

    grid = (Bp // TB,)
    interpret = jax.default_backend() != "tpu"  # tests run the kernel interpreted
    out = pl.pallas_call(
        functools.partial(_fps_kernel, npoint=npoint),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((npoint, TB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npoint, Bp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((TB, N), jnp.float32)],
        interpret=interpret,
    )(x, y, z)
    return out.T[:B]


def furthest_point_sample(xyz: jnp.ndarray, npoint: int, use_pallas: bool | None = None):
    """Dispatch: Pallas on TPU, jnp reference elsewhere (identical semantics)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    return fps_pallas(xyz, npoint) if use_pallas else fps_ref(xyz, npoint)
