"""Multi-layer DINO feature fusion.

reference: networks/img_encoder/img_encoder.py:6-100: (1) softmax layer
attention over the 3 intermediate ViT layers, (2) spatial attention modulated
by a learned relative-position embedding over the patch grid, (3) an
edge-enhancement conv branch; combined with learned scalar weights.

Input: list of L token tensors (B, P, D); output (B, P, D). P must be a
square (patch grid).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class ImgEncoder(nn.Module):
    dim: int = 384
    num_patches: int = 256  # 16x16 grid for 256px / patch16
    dtype: jnp.dtype = None  # matmul/einsum compute dtype (params stay f32)

    @nn.compact
    def __call__(self, features):
        B, P, D = features[0].shape
        h = w = int(np.sqrt(P))

        # (1) layer attention (reference: :58-64). Computed per layer instead
        # of over a stacked (B, L, P, D) tensor: the stacked form plus its
        # axis-1 softmax/broadcast measured ~2.5 ms at the flagship shapes
        # (layout churn on the 75 MB stack dominates); per-layer matmuls with
        # a lane-axis softmax over the (B, P, L) logits is the same math.
        d0 = nn.Dense(D // 2, dtype=self.dtype)
        d1 = nn.Dense(1, dtype=self.dtype)
        logits = jnp.concatenate(
            [d1(nn.relu(d0(f))).astype(jnp.float32) for f in features], axis=-1
        )  # (B, P, L)
        lw = nn.softmax(logits, axis=-1)
        fused = sum(f * lw[..., i : i + 1] for i, f in enumerate(features))

        # (2) spatial relative-position attention (reference: :66-82)
        coords = np.stack(
            np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), axis=-1
        ).reshape(-1, 2)
        rel = coords[None, :, :] - coords[:, None, :] + (h - 1)  # (P, P, 2), >= 0
        max_rel = 2 * (h - 1)
        rel_idx = rel[..., 0] * (2 * (h - 1) + 1) + rel[..., 1]
        # the reference clamps indices into the (max_rel^2)-sized table
        # (img_encoder.py:72-74) — same capacity and clamping here
        rel_idx = np.clip(rel_idx, 0, max_rel * max_rel - 1)
        rel_emb = nn.Embed(max_rel * max_rel, D // 4)(jnp.asarray(rel_idx))  # (P,P,D/4)

        dt = self.dtype or fused.dtype
        feat_geo = fused[:, :, D // 4 :].astype(dt)
        attn_spatial = jnp.einsum(
            "bpd,bqd->bpq", feat_geo, feat_geo, preferred_element_type=jnp.float32
        )
        attn_spatial = attn_spatial * jnp.sum(rel_emb, axis=-1)[None]
        attn_spatial = nn.softmax(attn_spatial, axis=-1)
        geo = jnp.einsum(
            "bpq,bqd->bpd", attn_spatial.astype(dt), fused.astype(dt),
            preferred_element_type=jnp.float32,
        )

        # (3) edge enhancement (reference: :86-91)
        spatial = fused.reshape(B, h, w, D)
        edge = nn.Conv(D // 4, (3, 3), padding="SAME", dtype=self.dtype)(spatial)
        edge = edge.astype(jnp.float32)
        edge = nn.relu(edge)
        edge = jnp.mean(edge, axis=(1, 2))  # (B, D/4) adaptive avg pool
        edge_w = jnp.tile(edge[:, None, :], (1, 1, 4))  # (B, 1, D)
        edge_enhanced = fused * edge_w

        geo_weight = self.param("geo_weight", nn.initializers.constant(0.2), ())
        edge_weight = self.param("edge_weight", nn.initializers.constant(0.1), ())
        return fused + nn.relu(geo_weight) * geo + nn.relu(edge_weight) * edge_enhanced
