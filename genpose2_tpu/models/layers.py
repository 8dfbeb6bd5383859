"""Shared building blocks (flax.linen, channels-last).

The reference's SharedMLP is a stack of Conv2d(1x1)+BN+ReLU over a
channels-first grouped tensor (reference: pointnet2/pytorch_utils.py:5-33);
with channels last a 1x1 conv IS a Dense on the feature axis, which feeds the
MXU directly.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

zero_init = nn.initializers.zeros


class Dense(nn.Dense):
    pass


class MLP(nn.Module):
    """Dense stack with an activation between layers (and optionally after the
    final layer). ``zero_final`` zero-initializes the last layer — the
    reference zero-inits every score head's output layer
    (reference: networks/gf_algorithms/scorenet.py:15-21,190-209)."""

    features: Sequence[int]
    act: Callable = nn.relu
    final_act: bool = False
    zero_final: bool = False

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            last = i == len(self.features) - 1
            kernel_init = (
                nn.initializers.zeros
                if (last and self.zero_final)
                else nn.initializers.lecun_normal()
            )
            x = nn.Dense(f, kernel_init=kernel_init)(x)
            if not last or self.final_act:
                x = self.act(x)
        return x


class SharedMLP(nn.Module):
    """Dense + BatchNorm + ReLU stack applied along the last axis.

    BatchNorm statistics are taken over all non-feature axes, matching
    nn.BatchNorm2d over (B, C, npoint, nsample) in the reference
    (reference: pytorch_utils.py:14-33 with bn=True). ``dtype`` selects the
    matmul compute dtype (params stay f32; BN runs in f32)."""

    features: Sequence[int]
    use_bn: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f in self.features:
            x = nn.Dense(f, use_bias=not self.use_bn, dtype=self.dtype)(x)
            if self.use_bn:
                # BN stays f32 (measured: bf16 BN costs ~9% end-to-end via
                # extra relayouts, and f32 stats are safer for training)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=jnp.float32,
                )(x.astype(jnp.float32))
            x = nn.relu(x)
        return x


class GaussianFourierProjection(nn.Module):
    """Random-feature time embedding: fixed W ~ N(0, scale^2), output
    [sin(2 pi W t), cos(2 pi W t)] (reference: scorenet.py:77-88)."""

    embed_dim: int = 128
    scale: float = 30.0

    @nn.compact
    def __call__(self, t):
        # fixed (non-trainable) weights, stored in their own collection
        W = self.variable(
            "constants",
            "W",
            lambda: jax.random.normal(self.make_rng("params"), (self.embed_dim // 2,))
            * self.scale,
        ).value
        t = t.reshape(t.shape[0], 1)
        proj = t * W[None, :] * 2.0 * jnp.pi
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def linear_resize_points(x: jnp.ndarray, new_n: int) -> jnp.ndarray:
    """Linear 1-D resize along the point axis of a (B, N, C) tensor, matching
    torch F.interpolate(mode='linear', align_corners=False)
    (reference: pointnet2.py:344-350 downsampling the DINO features).

    Exact 2x downsampling — the only ratio the encoder stack uses
    (1024->512->256->128->64) — reduces to averaging adjacent pairs
    (half-pixel centers land exactly between the two source points), which
    runs as a strided slice + add instead of jax.image.resize's gather/conv
    lowering (measured ~3 ms per call at (64, 1024, 384) on v5e)."""
    B, N, C = x.shape
    if N == new_n:
        return x
    if N == 2 * new_n:
        return 0.5 * (x[:, 0::2] + x[:, 1::2])
    # antialias=False matches torch F.interpolate(mode='linear',
    # align_corners=False) for every ratio (jax.image.resize antialiases on
    # downsample by default, which is a different filter than the reference).
    return jax.image.resize(x, (B, new_n, C), method="linear", antialias=False)
