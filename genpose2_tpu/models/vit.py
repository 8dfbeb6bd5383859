"""Frozen ViT image backbone (DINO-style) in flax.linen.

The reference loads a pretrained DINOv3 ViT-S+/16 via torch.hub from a local
checkout that is NOT part of the repo (reference: networks/posenet.py:56-62 —
an external asset), and consumes 3 intermediate layers [2, 6, 11]
(reference: posenet.py:138-144). Here the backbone is a clean JAX ViT with:

- the same interface: ``get_intermediate_layers(x, n, norm=True)`` returning
  (B, num_patches, dim) token features per requested block;
- ``load_torch_state_dict`` to ingest DINOv2-format torch weights when
  available (timm/dino naming);
- an interchangeable "feature provider" design: the composition root accepts
  precomputed patch features instead of pixels (SURVEY.md §7 decision 7), so
  metric-parity runs do not depend on the external checkpoint.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layer_scale_init: Optional[float] = 1e-5
    dtype: Optional[jnp.dtype] = None  # matmul compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm1", dtype=jnp.float32)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim, name="attn",
            dtype=self.dtype,
        )(h, h)
        if self.layer_scale_init is not None:
            gamma1 = self.param(
                "ls1", nn.initializers.constant(self.layer_scale_init), (self.dim,)
            )
            h = h * gamma1
        x = x + h
        h = nn.LayerNorm(name="norm2", dtype=jnp.float32)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1", dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, name="mlp_fc2", dtype=self.dtype)(h)
        if self.layer_scale_init is not None:
            gamma2 = self.param(
                "ls2", nn.initializers.constant(self.layer_scale_init), (self.dim,)
            )
            h = h * gamma2
        return x + h


class ViT(nn.Module):
    patch_size: int = 16
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    num_register_tokens: int = 0
    dtype: Optional[jnp.dtype] = None  # matmul compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x, intermediate: Sequence[int] = (), norm: bool = True):
        """x (B, H, W, 3) -> final tokens (B, P, dim); with ``intermediate``
        also returns the listed blocks' patch tokens (norm'd), mirroring
        dinov2's get_intermediate_layers."""
        B, H, W, _ = x.shape
        p = self.patch_size
        tokens = nn.Conv(
            self.dim, (p, p), strides=(p, p), name="patch_embed", dtype=self.dtype
        )(x)
        tokens = tokens.astype(jnp.float32)
        tokens = tokens.reshape(B, -1, self.dim)
        P = tokens.shape[1]

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, P + 1, self.dim)
        )
        tokens = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), tokens], 1)
        tokens = tokens + pos
        if self.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.zeros,
                (1, self.num_register_tokens, self.dim),
            )
            tokens = jnp.concatenate(
                [tokens[:, :1], jnp.broadcast_to(reg, (B, self.num_register_tokens, self.dim)), tokens[:, 1:]],
                axis=1,
            )

        final_norm = nn.LayerNorm(name="norm")
        outputs = []
        skip = 1 + self.num_register_tokens
        for i in range(self.depth):
            tokens = ViTBlock(
                self.dim, self.num_heads, self.mlp_ratio, name=f"block_{i}",
                dtype=self.dtype,
            )(tokens)
            if i in intermediate:
                t = final_norm(tokens) if norm else tokens
                outputs.append(t[:, skip:])
        if intermediate:
            return outputs
        return final_norm(tokens)[:, skip:]


def vit_s16(**kw) -> ViT:
    defaults = dict(patch_size=16, dim=384, depth=12, num_heads=6)
    defaults.update(kw)
    return ViT(**defaults)


def load_torch_state_dict(params: dict, state_dict: dict) -> dict:
    """Best-effort mapping of a DINOv2-format torch state_dict into this ViT's
    param tree (in place on a copied tree). Unmatched keys are reported."""
    import copy

    params = copy.deepcopy(params)
    p = params["params"] if "params" in params else params

    def put(dst, key, value):
        dst[key] = jnp.asarray(np.asarray(value))

    unmatched = []
    for k, v in state_dict.items():
        try:
            if k == "cls_token":
                put(p, "cls_token", v)
            elif k == "pos_embed":
                put(p, "pos_embed", v)
            elif k == "register_tokens":
                put(p, "register_tokens", v)
            elif k == "patch_embed.proj.weight":
                put(p["patch_embed"], "kernel", np.transpose(np.asarray(v), (2, 3, 1, 0)))
            elif k == "patch_embed.proj.bias":
                put(p["patch_embed"], "bias", v)
            elif k.startswith("blocks."):
                parts = k.split(".")
                blk = p[f"block_{parts[1]}"]
                rest = ".".join(parts[2:])
                w = np.asarray(v)
                if rest == "norm1.weight":
                    put(blk["norm1"], "scale", w)
                elif rest == "norm1.bias":
                    put(blk["norm1"], "bias", w)
                elif rest == "norm2.weight":
                    put(blk["norm2"], "scale", w)
                elif rest == "norm2.bias":
                    put(blk["norm2"], "bias", w)
                elif rest == "ls1.gamma":
                    put(blk, "ls1", w)
                elif rest == "ls2.gamma":
                    put(blk, "ls2", w)
                elif rest == "mlp.fc1.weight":
                    put(blk["mlp_fc1"], "kernel", w.T)
                elif rest == "mlp.fc1.bias":
                    put(blk["mlp_fc1"], "bias", w)
                elif rest == "mlp.fc2.weight":
                    put(blk["mlp_fc2"], "kernel", w.T)
                elif rest == "mlp.fc2.bias":
                    put(blk["mlp_fc2"], "bias", w)
                elif rest.startswith("attn."):
                    attn = blk["attn"]
                    dim = w.shape[-1] if w.ndim > 1 else w.shape[0]
                    if rest == "attn.qkv.weight":
                        d = w.shape[1]
                        H = attn["query"]["kernel"].shape[1]
                        hd = d // H
                        q, kk, vv = np.split(w, 3, axis=0)
                        put(attn["query"], "kernel", q.T.reshape(d, H, hd))
                        put(attn["key"], "kernel", kk.T.reshape(d, H, hd))
                        put(attn["value"], "kernel", vv.T.reshape(d, H, hd))
                    elif rest == "attn.qkv.bias":
                        d = w.shape[0] // 3
                        H = attn["query"]["kernel"].shape[1]
                        hd = d // H
                        q, kk, vv = np.split(w, 3, axis=0)
                        put(attn["query"], "bias", q.reshape(H, hd))
                        put(attn["key"], "bias", kk.reshape(H, hd))
                        put(attn["value"], "bias", vv.reshape(H, hd))
                    elif rest == "attn.proj.weight":
                        d = w.shape[0]
                        H = attn["out"]["kernel"].shape[0]
                        hd = d // H
                        put(attn["out"], "kernel", w.T.reshape(H, hd, d))
                    elif rest == "attn.proj.bias":
                        put(attn["out"], "bias", w)
                    else:
                        unmatched.append(k)
                else:
                    unmatched.append(k)
            elif k == "norm.weight":
                put(p["norm"], "scale", v)
            elif k == "norm.bias":
                put(p["norm"], "bias", v)
            else:
                unmatched.append(k)
        except Exception:
            unmatched.append(k)
    if unmatched:
        print(f"[vit] {len(unmatched)} unmatched torch keys, e.g. {unmatched[:5]}")
    return params
