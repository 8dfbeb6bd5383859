"""Per-point-feature regression heads (the reference's ``per_point_feat``
path, disabled by default but part of the surface).

reference: networks/decoder_head/rot_head.py:7-35, trans_head.py:9-40 — 1x1
conv stacks over per-point features with a global max-pool bottleneck.
Channels-last here: (B, N, C) -> (B, out_dim)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class RotHead(nn.Module):
    """reference: rot_head.py:7-35: 1x1 convs 1289->256->256, max-pool over
    points, then 256->256->out_dim."""

    out_dim: int = 3

    @nn.compact
    def __call__(self, feat):  # (B, N, C)
        x = nn.relu(nn.Dense(256)(feat))
        x = nn.relu(nn.Dense(256)(x))
        x = jnp.max(x, axis=1)  # (B, 256)
        x = nn.relu(nn.Dense(256)(x))
        return nn.Dense(self.out_dim)(x)


class TransHead(nn.Module):
    """reference: trans_head.py:9-40 (same topology, separate weights)."""

    out_dim: int = 3

    @nn.compact
    def __call__(self, feat):
        x = nn.relu(nn.Dense(256)(feat))
        x = nn.relu(nn.Dense(256)(x))
        x = jnp.max(x, axis=1)
        x = nn.relu(nn.Dense(256)(x))
        return nn.Dense(self.out_dim)(x)
