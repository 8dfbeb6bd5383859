"""Three-nearest-neighbor feature interpolation (the feature-propagation path).

reference: src/interpolate_gpu.cu:9-74 (3-NN), :77-… (weighted interpolation),
consumed by PointnetFPModule (reference: pointnet2_modules.py:164-215). Only the
segmentation-style encoder uses it (the cls encoders never call it,
reference: pointnet2.py:244-252) — included for capability completeness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit)
def three_nn(unknown: jnp.ndarray, known: jnp.ndarray):
    """unknown (B, N, 3), known (B, M, 3) -> (dist (B, N, 3), idx (B, N, 3)).

    Distances are euclidean (the CUDA wrapper returns sqrt of the squared
    distances, reference: pointnet2_utils.py:112).
    """
    d2 = jnp.sum((unknown[:, :, None, :] - known[:, None, :, :]) ** 2, axis=-1)  # (B,N,M)
    neg_d2, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg_d2, 0.0)), idx.astype(jnp.int32)


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray):
    """features (B, M, C), idx (B, N, 3), weight (B, N, 3) -> (B, N, C).

    Differentiable in ``features`` (transpose = deterministic scatter-add;
    the CUDA version uses atomicAdd, reference: interpolate_gpu.cu grad).
    """
    B, N, _ = idx.shape
    gathered = jnp.take_along_axis(
        features, idx.reshape(B, N * 3)[..., None].astype(jnp.int32), axis=1
    ).reshape(B, N, 3, features.shape[-1])
    return jnp.sum(gathered * weight[..., None], axis=2)
