"""Bounding-box side-length regression from the frozen score-encoder feature
and the (predicted) rotation axes.

reference: networks/scalenet.py:12-56. The axes (B, 3, 3) are sin/cos encoded
(encode_axes with dim = embedding_dim // 18; reference: scalenet.py:45,
utils/genpose_utils.py:8-18), passed through a 256-256 MLP, concatenated with
the point (and optional rgb) feature, and regressed to 3 lengths with a
zero-initialized output layer. Loss = MSE x 1e4 (reference: scalenet.py:51-56).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from genpose2_tpu.models.layers import MLP
from genpose2_tpu.so3.rotations import encode_axes


class ScaleNet(nn.Module):
    embedding_dim: int = 180  # must be divisible by 18
    dino_dim: int = 0

    @nn.compact
    def __call__(self, pts_feat, axes, rgb_feat=None):
        """pts_feat (B, pts_dim), axes (B, 3, 3), rgb_feat (B, dino_dim)|None
        -> lengths (B, 3)."""
        assert self.embedding_dim % 18 == 0
        axes_feat = MLP((256, 256), final_act=True)(
            encode_axes(axes, self.embedding_dim // 18)
        )
        total = [pts_feat, axes_feat]
        if self.dino_dim:
            total.append(rgb_feat)
        total_feat = jnp.concatenate(total, axis=-1)
        return MLP((256, 3), zero_final=True)(total_feat)


def scale_loss(pred_len, gt_len):
    """reference: scalenet.py:51-56."""
    return jnp.mean((pred_len - gt_len) ** 2) * 10000.0
