"""Attention blocks for the transformer-augmented point encoder.

Channels-last re-designs of the reference's modules
(reference: networks/pts_encoder/attention.py). Only the variants actually
wired into the live encoder are implemented fully:
``EfficientRelativePositionalEncoding`` (attention.py:648-735),
``TransformerBlockWithRelativePE`` (:491-533) with
``MultiheadAttentionWithRelativePE`` (:414-488), and
``GatedAttentionFusion`` (:224-325). A plain ``TransformerBlock`` (:72-171)
is provided for the legacy path. The reference's unused slow variants
(``LocalRelativePositionalEncoding`` with Python loops, :580-645) are
deliberately not ported — the Efficient variant is the selected one
(reference: pointnet2.py:309).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from genpose2_tpu.models.layers import linear_resize_points


class _ShiftConv1d(nn.Module):
    """SAME-padded 1-D conv as K shifted multiply-adds.

    Param-tree identical to ``nn.Conv(out, (K,), padding='SAME',
    use_bias=False)`` (kernel (K, C_in, C_out)), but the tiny-channel case the
    spatial-attention gate needs (C_in=2, C_out=1) lowers to pure VPU fused
    multiply-adds instead of XLA's conv path, which pads the channels to full
    lanes (measured ~2 ms per call at (64, 512, 2) on v5e)."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        K = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (K, x.shape[-1], self.features),
        )
        lo = (K - 1) // 2
        xp = jnp.pad(x, ((0, 0), (lo, K - 1 - lo), (0, 0)))
        N = x.shape[1]
        out = 0.0
        for i in range(K):
            out = out + xp[:, i : i + N, :] @ kernel[i]
        return out


class EfficientRelativePositionalEncoding(nn.Module):
    """Distance-MLP + direction-MLP -> fused per-head attention bias.

    xyz (B, N, 3) -> bias (B, num_heads, N, N).
    reference: attention.py:648-735 (use_distance and use_direction both on,
    so the fusion layer replaces the sum, :726-730).
    """

    num_heads: int = 8

    @nn.compact
    def __call__(self, xyz):
        # rel[b, i, j] = xyz[b, j] - xyz[b, i] (reference: attention.py:707,
        # xyz.unsqueeze(1) - xyz.unsqueeze(2)); direction sign/orientation
        # matters for torch-weight ingestion parity. NOTE: flax checkpoints
        # trained before commit 77fc0a7 used the opposite sign and are NOT
        # weight-compatible with this module (no released checkpoints
        # predate the flip)
        rel = xyz[:, None, :, :] - xyz[:, :, None, :]  # (B, N, N, 3)
        dist = jnp.linalg.norm(rel, axis=-1, keepdims=True)
        direction = rel / (dist + 1e-7)

        h = self.num_heads
        dist_bias = nn.Dense(16)(dist)
        dist_bias = nn.relu(dist_bias)
        dist_bias = nn.Dense(h)(dist_bias)

        dir_bias = nn.Dense(16)(direction)
        dir_bias = nn.relu(dir_bias)
        dir_bias = nn.Dense(h)(dir_bias)

        fused = nn.Dense(h)(jnp.concatenate([dist_bias, dir_bias], axis=-1))
        return jnp.transpose(fused, (0, 3, 1, 2))  # (B, H, N, N)


class MultiheadAttentionWithRelativePE(nn.Module):
    """Standard MHA with an additive per-head bias on the attention scores.

    reference: attention.py:414-488.
    """

    d_model: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, relative_bias=None, deterministic: bool = True):
        B, N, _ = x.shape
        H = self.num_heads
        D = self.d_model // H
        q = nn.Dense(self.d_model, name="wq")(x).reshape(B, N, H, D).transpose(0, 2, 1, 3)
        k = nn.Dense(self.d_model, name="wk")(x).reshape(B, N, H, D).transpose(0, 2, 1, 3)
        v = nn.Dense(self.d_model, name="wv")(x).reshape(B, N, H, D).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(D).astype(x.dtype)
        if relative_bias is not None:
            scores = scores + relative_bias
        weights = nn.softmax(scores, axis=-1)
        weights = nn.Dropout(self.dropout)(weights, deterministic=deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.d_model)
        return nn.Dense(self.d_model, name="wo")(out)


class TransformerBlockWithRelativePE(nn.Module):
    """Post-norm transformer block (attn -> add&norm -> FFN -> add&norm),
    ReLU FFN with 4x expansion. reference: attention.py:491-533.

    Input/output are channels-last (B, N, C) (the reference transposes around
    a channels-first interface; here no transposes are needed)."""

    d_model: int
    num_heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, relative_bias=None, deterministic: bool = True):
        attn = MultiheadAttentionWithRelativePE(self.d_model, self.num_heads, self.dropout)(
            x, relative_bias, deterministic
        )
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm()(x + attn)
        ff = nn.Dense(self.d_model * 4)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(self.d_model)(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm()(x + ff)


class TransformerBlock(nn.Module):
    """Pre-norm block with GELU FFN (legacy variant, reference:
    attention.py:72-171 with pre_norm=True, no positional encoding)."""

    d_model: int
    num_heads: int = 8
    dropout: float = 0.1
    ff_ratio: int = 4

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = nn.LayerNorm()(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout
        )(y, y, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm()(x)
        ff = nn.Dense(self.d_model * self.ff_ratio)(x)
        ff = nn.gelu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(self.d_model)(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return x + ff


class GatedAttentionFusion(nn.Module):
    """Channel attention + spatial attention + gated fusion of the current
    point features with (transformed) original DINO features.

    current (B, N, C_cur), original (B, N_orig, C_orig) -> (B, N, C_cur).
    reference: attention.py:224-325. ``dtype`` selects the Dense compute
    dtype (params and BatchNorm stay f32).
    """

    current_channels: int
    dropout_bn_momentum: float = 0.9
    dtype: jnp.dtype = None

    def _bn(self, train):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)

    @nn.compact
    def __call__(self, current, original, train: bool = False):
        C = self.current_channels
        if original.shape[1] != current.shape[1]:
            original = linear_resize_points(original, current.shape[1])

        # original feature transform: Dense + BN + ReLU (reference :264-268)
        orig_t = nn.Dense(C, dtype=self.dtype)(original)
        orig_t = self._bn(train)(orig_t)
        orig_t = nn.relu(orig_t)

        # channel attention over the global-average-pooled concat (:233-248)
        pooled = jnp.mean(jnp.concatenate([current, orig_t], axis=-1), axis=1, keepdims=True)
        ca = nn.Dense((2 * C) // 4, dtype=self.dtype)(pooled)
        ca = nn.relu(ca)
        ca = nn.Dense(C, dtype=self.dtype)(ca)
        ca = ca.astype(jnp.float32)
        ca = nn.sigmoid(ca)  # (B, 1, C)

        # spatial attention: conv(k=7) over [max_c, mean_c] along points
        # (:251-254); shifted-multiply-add form, param tree identical to the
        # nn.Conv it replaces (name pinned to the original auto-name)
        mx = jnp.max(current, axis=-1, keepdims=True)
        av = jnp.mean(current, axis=-1, keepdims=True)
        sa = _ShiftConv1d(1, 7, name="Conv_0")(jnp.concatenate([mx, av], axis=-1))
        sa = nn.sigmoid(sa)  # (B, N, 1)

        attended = orig_t * ca * sa

        # gate (:257-261)
        gate = nn.Dense(C, dtype=self.dtype)(jnp.concatenate([current, attended], axis=-1))
        gate = self._bn(train)(gate)
        gate = nn.sigmoid(gate)
        fused = gate * current + (1.0 - gate) * attended

        # output transform (:278-282)
        out = nn.Dense(C, dtype=self.dtype)(fused)
        out = self._bn(train)(out)
        return nn.relu(out)
