"""Legacy vanilla PointNet encoder with a learned input transform.

reference: networks/pts_encoder/pointnets.py:14-123 (BN removed there too).
Channels-last: pointcloud (B, N, C_in) -> (B, out_dim).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class STNkd(nn.Module):
    """T-Net predicting a (k, k) transform, initialized near identity via a
    residual add of I (reference: pointnets.py:45-79)."""

    k: int = 3

    @nn.compact
    def __call__(self, x):  # x (B, N, k)
        h = nn.relu(nn.Dense(64)(x))
        h = nn.relu(nn.Dense(128)(h))
        h = nn.relu(nn.Dense(1024)(h))
        h = jnp.max(h, axis=1)  # (B, 1024)
        h = nn.relu(nn.Dense(512)(h))
        h = nn.relu(nn.Dense(256)(h))
        h = nn.Dense(self.k * self.k)(h)
        eye = jnp.eye(self.k, dtype=x.dtype).reshape(1, self.k * self.k)
        return (h + eye).reshape(-1, self.k, self.k)


class PointNetFeat(nn.Module):
    """reference: pointnets.py:83-123. STN input transform, then
    64-128-512-out_dim point MLP and global max pool."""

    out_dim: int = 1024
    in_dim: int = 3
    feature_transform: bool = False
    global_feat: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):  # x (B, N, in_dim)
        trans = STNkd(self.in_dim)(x)
        x = jnp.einsum("bnk,bkj->bnj", x, trans)
        x = nn.relu(nn.Dense(64)(x))
        if self.feature_transform:
            ft = STNkd(64)(x)
            x = jnp.einsum("bnk,bkj->bnj", x, ft)
        point_feat = x
        x = nn.relu(nn.Dense(128)(x))
        x = nn.relu(nn.Dense(512)(x))
        x = nn.Dense(self.out_dim)(x)
        g = jnp.max(x, axis=1)  # (B, out_dim)
        if self.global_feat:
            return g
        tiled = jnp.broadcast_to(g[:, None, :], (x.shape[0], x.shape[1], self.out_dim))
        return jnp.concatenate([tiled, point_feat], axis=-1)
