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

import functools
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _patch_embed_matmul(module, x, dim: int, p: int, dtype):
    """Patchify as reshape + ONE MXU matmul instead of a stride-p conv.

    A (p, p)-kernel stride-p convolution is mathematically a dense layer over
    flattened patches, but XLA lowers the strided conv poorly on TPU (im2col
    expansions off the MXU fast path). Parameters keep the Conv layout
    (kernel (p, p, 3, dim)) so checkpoint ingestion is unchanged."""
    B, H, W, C = x.shape
    gh, gw = H // p, W // p
    kernel = module.param(
        "kernel",
        nn.initializers.lecun_normal(),
        (p, p, C, dim),
    )
    bias = module.param("bias", nn.initializers.zeros, (dim,))
    patches = x.reshape(B, gh, p, gw, p, C).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(B, gh * gw, p * p * C)
    w = kernel.reshape(p * p * C, dim)
    if dtype is not None:
        patches = patches.astype(dtype)
        w = w.astype(dtype)
    tokens = (
        jnp.dot(patches, w, preferred_element_type=jnp.float32) + bias
    )
    return tokens  # (B, gh*gw, dim) f32


class PatchEmbed(nn.Module):
    """Conv-parameter-compatible patch embedding (see _patch_embed_matmul)."""

    dim: int
    patch: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        return _patch_embed_matmul(self, x, self.dim, self.patch, self.dtype)


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
    def __call__(
        self,
        x,
        intermediate: Sequence[int] = (),
        norm: bool = True,
        return_class_token: bool = False,
    ):
        """x (B, H, W, 3) -> final tokens (B, P, dim); with ``intermediate``
        also returns the listed blocks' patch tokens (norm'd), mirroring
        dinov2's get_intermediate_layers. ``return_class_token`` returns the
        final normed CLS embedding (B, dim) instead (the dino='global' feature,
        reference: posenet.py:316-337)."""
        B, H, W, _ = x.shape
        p = self.patch_size
        tokens = PatchEmbed(self.dim, p, name="patch_embed", dtype=self.dtype)(x)
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
        if return_class_token:
            return final_norm(tokens)[:, 0]
        return final_norm(tokens)[:, skip:]


def vit_s16(**kw) -> ViT:
    defaults = dict(patch_size=16, dim=384, depth=12, num_heads=6)
    defaults.update(kw)
    return ViT(**defaults)


# --------------------------------------------------------------------------
# DINOv3 (the backbone the fork actually runs: `dinov3_vits16plus`,
# reference: networks/posenet.py:56-62). Architectural differences from the
# DINOv2-style ViT above, per the published DINOv3 design:
#   - NO learned absolute positional embedding: 2D axial RoPE rotates the
#     query/key patch tokens inside every attention (prefix tokens — cls +
#     storage/register — are not rotated);
#   - 4 "storage" (register) tokens appended after the cls token;
#   - the "plus" variants use a SwiGLU feed-forward (w3(silu(w1 x) * w2 x));
#   - LayerScale as in v2.
# The RoPE period table is a persistent buffer in DINOv3 checkpoints
# (rope_embed.periods); ingestion loads it verbatim, so checkpoint parity does
# not depend on reproducing the period formula.
# --------------------------------------------------------------------------


def rope_tables(periods: jnp.ndarray, gh: int, gw: int) -> tuple:
    """sin/cos tables for a gh x gw patch grid.

    Coordinates are normalized per axis to [-1, 1] (DINOv3's
    normalize_coords='separate'); angles = 2*pi*coord / period per frequency,
    laid out [y-freqs | x-freqs] and tiled x2 so the rotation pairs dims
    (i, i + D/2) — the rotate-half convention."""
    ys = (jnp.arange(gh, dtype=jnp.float32) + 0.5) / gh * 2.0 - 1.0
    xs = (jnp.arange(gw, dtype=jnp.float32) + 0.5) / gw * 2.0 - 1.0
    coords = jnp.stack(
        [jnp.repeat(ys, gw), jnp.tile(xs, gh)], axis=-1
    )  # (P, 2): per-patch (y, x)
    angles = 2.0 * jnp.pi * coords[:, :, None] / periods[None, None, :]  # (P,2,Dq)
    angles = angles.reshape(gh * gw, -1)  # (P, D/2)
    angles = jnp.concatenate([angles, angles], axis=-1)  # (P, D)
    return jnp.sin(angles), jnp.cos(angles)


def rope_rotate(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """x (B, P, H, hd) rotated by per-position sin/cos (P, hd)."""
    d = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., d:], x[..., :d]], axis=-1)
    return x * cos[None, :, None, :] + rot * sin[None, :, None, :]


# Round-5 ViT pass-3 experiments, both measured NET-WORSE and kept off
# (same-session A/B on v5e, profile_feat_split.py vit3-floor at the flagship
# shape B=64, N=272; baseline = folded-RoPE qkv + XLA tail-residual/norm1
# = 9.77 ms/forward):
#
# _INKERNEL_ROPE: apply rotate-half on the VMEM head blocks inside
# vit_attention_tm so the qkv projection stays (D, 3D) instead of carrying
# the folded rot(q)/rot(k) columns ((D, 5D), ~10% extra matmul FLOPs).
# Measured 12.10 ms (+2.3): the per-head 32-lane rotate serializes with the
# attention matmuls and costs far more than the projection columns it saves.
_INKERNEL_ROPE = False

# _DEFER_TAIL: defer each block's tail residual (x + gamma2*h) into the NEXT
# block's norm1 via the fused add+LN kernel (cross-block fusion, one
# elementwise pass + one XLA LN removed per block on paper). Measured
# 10.43 ms (+0.7): XLA already fuses the tail add into the surrounding
# elementwise/LN fusions, and the extra kernel boundary costs more than the
# pass it saves — consistent with the round-4 finding that a standalone LN
# kernel was net-worse than XLA's stats+apply split.
_DEFER_TAIL = False


class DinoV3Attention(nn.Module):
    """RoPE'd MHA. ``sin``/``cos`` are FULL-length tables whose prefix rows
    are the identity rotation (sin=0, cos=1) — rotating every token with
    identity on cls/storage rows is algebraically the reference's
    rotate-patches-only, without the prefix split/concat layout round trip.

    Main (token-major) path: the qkv projection stays (D, 3D) and RoPE is
    applied INSIDE the attention kernel on the VMEM head blocks
    (ops/vit_attention.py:vit_attention_tm) — no roped-q/k HBM round trips
    and no extra projection columns. Fallback (unpadded N): the rotate-half
    permutation is folded into the projection weights, rope(q) =
    (x @ Wq) * cos + (x @ rot(Wq)) * sin, so RoPE is two elementwise
    multiplies with no activation relayout (the (B, N, 3D) 32-lane swap
    measured ~25% of the ViT's non-attention time). The param tree keeps the
    exact nn.Dense(name='qkv') layout for checkpoint parity either way.

    The attention core runs in the fused VMEM kernel (ops/vit_attention.py);
    softmax is f32 either way (parity: tests/test_vit_weights.py)."""

    dim: int
    num_heads: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, sin, cos, n_valid: Optional[int] = None):
        from genpose2_tpu.ops.vit_attention import vit_attention

        B, N, D = x.shape
        H = self.num_heads
        hd = D // H
        h2 = hd // 2
        dt = self.dtype or jnp.float32

        kernel, bias = _DenseParams(D, 3 * D, name="qkv")()

        sublane = 8 if dt == jnp.float32 else 16
        if _INKERNEL_ROPE and N % sublane == 0:
            # token axis already tile-padded (whole-network pad in DinoV3ViT):
            # the token-major kernel needs no head-major transposes, and RoPE
            # is applied INSIDE the kernel on the VMEM head blocks — the
            # projection stays (D, 3D) (the folded rot(q)/rot(k) columns were
            # 2D of 5D = ~10% of the block's matmul FLOPs) and the roped q/k
            # never round-trip HBM as separate elementwise passes
            from genpose2_tpu.ops.vit_attention import vit_attention_tm

            W3, b3 = kernel, bias
            if self.dtype is not None:
                x = x.astype(self.dtype)
                W3 = W3.astype(self.dtype)
            out = (
                jnp.dot(x, W3, preferred_element_type=jnp.float32) + b3
            ).astype(dt)  # (B, N, 3D): [q | k | v]
            att = vit_attention_tm(
                out[..., :D], out[..., D : 2 * D], out[..., 2 * D :], H,
                n_valid=n_valid, sin=sin[:, :hd], cos=cos[:, :hd],
            )
        else:
            # fallback (unpadded token axis): fold the rotate-half permutation
            # into the projection weights — rope(q) = (x@Wq)*cos + (x@rot(Wq))
            # *sin — so RoPE is two elementwise multiplies, no relayout
            def rot_cols(w):
                # rotate-half on the OUTPUT columns, per head: col i <-
                # -col(i+h2), col i+h2 <- col i (rope_rotate's concat(-x2, x1))
                wh = w.reshape(-1, H, hd)
                out = jnp.concatenate([-wh[..., h2:], wh[..., :h2]], axis=-1)
                return out.reshape(w.shape)

            Wq, Wk = kernel[:, :D], kernel[:, D : 2 * D]
            bq, bk = bias[:D], bias[D : 2 * D]
            W5 = jnp.concatenate([kernel, rot_cols(Wq), rot_cols(Wk)], axis=1)
            b5 = jnp.concatenate([bias, rot_cols(bq[None])[0], rot_cols(bk[None])[0]])
            if self.dtype is not None:
                x = x.astype(self.dtype)
                W5 = W5.astype(self.dtype)
            out = (
                jnp.dot(x, W5, preferred_element_type=jnp.float32) + b5
            ).astype(dt)  # (B, N, 5D): [q | k | v | rot(q) | rot(k)]

            # tables arrive tiled to (N, D) (per-head-identical lanes): RoPE
            # is elementwise on (B, N, D) with no reshape/transpose
            cosD = cos.astype(dt)[None]
            sinD = sin.astype(dt)[None]
            q = out[..., :D] * cosD + out[..., 3 * D : 4 * D] * sinD
            k = out[..., D : 2 * D] * cosD + out[..., 4 * D : 5 * D] * sinD
            v = out[..., 2 * D : 3 * D]
            if N % sublane == 0:
                from genpose2_tpu.ops.vit_attention import vit_attention_tm

                att = vit_attention_tm(q, k, v, H, n_valid=n_valid)
            else:
                att = vit_attention(q, k, v, H, n_valid=n_valid)
        return nn.Dense(D, name="proj", dtype=self.dtype)(att.astype(dt))


class _LNParams(nn.Module):
    """Declares nn.LayerNorm-compatible params ('scale'/'bias', ones/zeros
    init) WITHOUT running the op, for the fused add+LN kernel path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _DenseParams(nn.Module):
    """Declares Dense-shaped params (kernel, bias) WITHOUT running the matmul,
    so sibling layers reading the same input can be fused into one wide
    matmul while the param tree (and checkpoint ingestion) stays identical to
    two nn.Dense layers. Initializers match nn.Dense defaults."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class DinoV3Block(nn.Module):
    dim: int
    num_heads: int
    ffn_hidden: int
    ffn_layer: str = "swiglu"  # 'swiglu' (plus variants) | 'mlp'
    layer_scale_init: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, sin, cos, n_valid: Optional[int] = None, pending=None):
        # The residual stream runs in the compute dtype (bf16 in the frozen
        # eval config): halves every elementwise HBM round trip. LayerNorm
        # statistics stay f32 either way; on the bf16 stream the mid-block
        # residual-add + LN2 run as ONE Pallas kernel (a standalone LN kernel
        # measured net-worse — it broke the surrounding XLA fusions).
        #
        # On the compute-dtype path the block's TAIL residual (x + gamma2*h)
        # is DEFERRED: the block returns (x, (h, gamma2)) and the NEXT block
        # folds it into its own norm1 via the same fused add+LN kernel —
        # cross-block fusion that removes one elementwise pass + one XLA LN
        # per block. ``pending`` is the previous block's deferred pair; the
        # caller (DinoV3ViT) materializes the sum where a full token tensor
        # is needed (intermediate taps, final norm).
        dt = self.dtype or jnp.float32
        if self.dtype is not None and _DEFER_TAIL:
            from genpose2_tpu.ops.layernorm import fast_add_layernorm

            s1, b1 = _LNParams(self.dim, name="norm1")()
            if pending is None:
                # first block: no deferred residual — plain LN via the same
                # kernel with a zero h (one extra VMEM read of zeros is
                # cheaper than a separate XLA LN program shape)
                from genpose2_tpu.ops.layernorm import fast_layernorm

                h = fast_layernorm(x.astype(dt), s1, b1, out_dtype=dt)
            else:
                h_prev, gamma_prev = pending
                x, h = fast_add_layernorm(
                    x.astype(dt), h_prev.astype(dt), gamma_prev, s1, b1,
                    out_dtype=dt,
                )
        else:
            assert pending is None
            h = nn.LayerNorm(name="norm1", dtype=jnp.float32)(x)
        h = DinoV3Attention(self.dim, self.num_heads, name="attn", dtype=self.dtype)(
            h, sin, cos, n_valid
        )
        gamma1 = self.param(
            "ls1", nn.initializers.constant(self.layer_scale_init), (self.dim,)
        )
        if self.dtype is not None:
            from genpose2_tpu.ops.layernorm import fast_add_layernorm

            s2, b2 = _LNParams(self.dim, name="norm2")()
            x, h = fast_add_layernorm(
                x.astype(dt), h.astype(dt), gamma1, s2, b2, out_dtype=dt
            )
        else:
            x = x + (h * gamma1).astype(dt)
            h = nn.LayerNorm(name="norm2", dtype=jnp.float32)(x)
        if self.ffn_layer == "swiglu":
            # w1 and w2 read the same activations: run them as ONE matmul over
            # the concatenated kernels (the param tree keeps separate w1/w2
            # Dense-shaped leaves for checkpoint ingestion; DINOv3 checkpoints
            # themselves ship the fused w12 form). Halves the HBM reads of h.
            k1, b1 = _DenseParams(h.shape[-1], self.ffn_hidden, name="mlp_w1")()
            k2, b2 = _DenseParams(h.shape[-1], self.ffn_hidden, name="mlp_w2")()
            w12 = jnp.concatenate([k1, k2], axis=1)
            b12 = jnp.concatenate([b1, b2])
            if self.dtype is not None:
                h = h.astype(self.dtype)
                w12 = w12.astype(self.dtype)
            # cast to the compute dtype immediately: the (B, N, 2*hidden)
            # intermediate is the block's largest tensor and silu/mul are
            # precision-insensitive here (f32 accumulation already happened)
            ab = (jnp.dot(h, w12, preferred_element_type=jnp.float32) + b12).astype(dt)
            a, b = ab[..., : self.ffn_hidden], ab[..., self.ffn_hidden :]
            h = nn.Dense(self.dim, name="mlp_w3", dtype=self.dtype)(
                (nn.silu(a) * b).astype(dt)
            )
        else:
            h = nn.Dense(self.ffn_hidden, name="mlp_fc1", dtype=self.dtype)(h)
            h = nn.gelu(h)
            h = nn.Dense(self.dim, name="mlp_fc2", dtype=self.dtype)(h)
        gamma2 = self.param(
            "ls2", nn.initializers.constant(self.layer_scale_init), (self.dim,)
        )
        if self.dtype is not None and _DEFER_TAIL:
            return x, (h, gamma2)  # tail deferred into the next block's norm1
        return x + (h * gamma2).astype(dt), None


class DinoV3ViT(nn.Module):
    """DINOv3-style ViT. Interface-compatible with ``ViT``:
    ``__call__(x, intermediate, norm)`` returns the requested blocks' patch
    tokens (cls + storage tokens stripped)."""

    patch_size: int = 16
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    num_storage_tokens: int = 4
    ffn_hidden: int = 1536
    ffn_layer: str = "swiglu"
    rope_base: float = 100.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        x,
        intermediate: Sequence[int] = (),
        norm: bool = True,
        return_class_token: bool = False,
    ):
        B, Hpx, Wpx, _ = x.shape
        p = self.patch_size
        gh, gw = Hpx // p, Wpx // p
        tokens = PatchEmbed(self.dim, p, name="patch_embed", dtype=self.dtype)(x)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        sto = self.param(
            "storage_tokens",
            nn.initializers.zeros,
            (1, self.num_storage_tokens, self.dim),
        )
        prefix = jnp.concatenate(
            [
                jnp.broadcast_to(cls, (B, 1, self.dim)),
                jnp.broadcast_to(sto, (B, self.num_storage_tokens, self.dim)),
            ],
            axis=1,
        )
        tokens = jnp.concatenate([prefix, tokens], axis=1)
        if self.dtype is not None:
            tokens = tokens.astype(self.dtype)  # bf16 residual stream
        num_prefix = 1 + self.num_storage_tokens

        hd = self.dim // self.num_heads
        dq = hd // 4
        periods = self.variable(
            "constants",
            "rope_periods",
            lambda: self.rope_base ** (jnp.arange(dq, dtype=jnp.float32) / dq),
        ).value
        sin, cos = rope_tables(periods, gh, gw)
        # full-length tables: identity rotation on the prefix rows (see
        # DinoV3Attention) so q/k rotate without a split/concat
        sin = jnp.concatenate([jnp.zeros((num_prefix, sin.shape[1]), sin.dtype), sin])
        cos = jnp.concatenate([jnp.ones((num_prefix, cos.shape[1]), cos.dtype), cos])
        # tile per-head-identical tables to (N, D) once for all blocks (the
        # attention applies them lane-elementwise, no per-block reshapes)
        sin = jnp.tile(sin, (1, self.num_heads))
        cos = jnp.tile(cos, (1, self.num_heads))

        # pad the token axis to the sublane tile ONCE for all 12 blocks: the
        # attention kernel would otherwise pay pad + slice + layout copies
        # per block (measured ~5.5 ms of a 15 ms forward at N=261, B=64).
        # Pad rows carry garbage that never contaminates real tokens (keys
        # are masked at n_valid inside the kernel) and are sliced off here at
        # the very end.
        N = tokens.shape[1]
        sub = 8 if (self.dtype is None or self.dtype == jnp.float32) else 16
        Np = ((N + sub - 1) // sub) * sub
        n_valid = N
        if Np != N:
            tokens = jnp.pad(tokens, ((0, 0), (0, Np - N), (0, 0)))
            sin = jnp.concatenate(
                [sin, jnp.zeros((Np - N, sin.shape[1]), sin.dtype)]
            )
            cos = jnp.concatenate(
                [cos, jnp.ones((Np - N, cos.shape[1]), cos.dtype)]
            )

        final_norm = nn.LayerNorm(name="norm")
        outputs = []
        pending = None  # previous block's deferred (h, gamma2) tail residual

        def materialize(tok, pend):
            if pend is None:
                return tok
            h, g = pend
            return tok + (h * g).astype(tok.dtype)

        for i in range(self.depth):
            tokens, pending = DinoV3Block(
                self.dim,
                self.num_heads,
                self.ffn_hidden,
                self.ffn_layer,
                name=f"block_{i}",
                dtype=self.dtype,
            )(tokens, sin, cos, n_valid, pending)
            if i in intermediate:
                full = materialize(tokens, pending)
                t = final_norm(full) if norm else full
                outputs.append(t[:, num_prefix:N])
        if intermediate:
            return outputs
        tokens = materialize(tokens, pending)
        if return_class_token:
            return final_norm(tokens)[:, 0]
        return final_norm(tokens)[:, num_prefix:N]


def vit_s16plus(**kw) -> DinoV3ViT:
    """DINOv3 ViT-S+/16 (`dinov3_vits16plus`): 384-d, 12 blocks, 6 heads,
    SwiGLU hidden 1536, 4 storage tokens, RoPE base 100 — ~29M params,
    matching the fork's checkpoint `dinov3_vits16plus_pretrain_lvd1689m`
    (reference: networks/posenet.py:56-62)."""
    defaults = dict(
        patch_size=16, dim=384, depth=12, num_heads=6,
        num_storage_tokens=4, ffn_hidden=1536, ffn_layer="swiglu",
    )
    defaults.update(kw)
    return DinoV3ViT(**defaults)


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


def load_dinov3_state_dict(variables: dict, state_dict: dict) -> dict:
    """Map a DINOv3-format torch state_dict into DinoV3ViT variables
    ({'params', 'constants'}). Handles the known naming variants:

    - ``storage_tokens`` / ``register_tokens``;
    - SwiGLU as separate ``mlp.w1/w2/w3`` or fused ``mlp.w12`` (w1 and w2
      stacked on the output dim) + ``w3``;
    - plain MLP ``mlp.fc1/fc2`` (non-plus variants);
    - ``rope_embed.periods`` loaded verbatim into the constants collection
      (so parity does not depend on the period formula);
    - ``mask_token`` / ``local_cls_norm`` heads are skipped (not used at
      inference).

    Unmatched keys are reported, mirroring load_torch_state_dict."""
    import copy

    variables = copy.deepcopy(variables)
    p = variables["params"]
    consts = variables.setdefault("constants", {})

    def arr(v):
        return jnp.asarray(np.asarray(v))

    unmatched = []
    skipped_prefixes = ("mask_token", "local_cls_norm", "head", "ibot", "dino_head")
    for k, v in state_dict.items():
        try:
            w = np.asarray(v)
            if k == "cls_token":
                p["cls_token"] = arr(w)
            elif k in ("storage_tokens", "register_tokens"):
                p["storage_tokens"] = arr(w)
            elif k in ("rope_embed.periods", "rope.periods", "periods"):
                consts["rope_periods"] = arr(w).astype(jnp.float32)
            elif k.startswith(skipped_prefixes):
                continue
            elif k == "patch_embed.proj.weight":
                p["patch_embed"]["kernel"] = arr(np.transpose(w, (2, 3, 1, 0)))
            elif k == "patch_embed.proj.bias":
                p["patch_embed"]["bias"] = arr(w)
            elif k == "norm.weight":
                p["norm"]["scale"] = arr(w)
            elif k == "norm.bias":
                p["norm"]["bias"] = arr(w)
            elif k.startswith("blocks."):
                parts = k.split(".")
                blk = p[f"block_{parts[1]}"]
                rest = ".".join(parts[2:])
                if rest in ("norm1.weight", "norm2.weight"):
                    blk[rest.split(".")[0]]["scale"] = arr(w)
                elif rest in ("norm1.bias", "norm2.bias"):
                    blk[rest.split(".")[0]]["bias"] = arr(w)
                elif rest in ("ls1.gamma", "ls1.lambda1"):
                    blk["ls1"] = arr(w)
                elif rest in ("ls2.gamma", "ls2.lambda1"):
                    blk["ls2"] = arr(w)
                elif rest == "attn.qkv.weight":
                    blk["attn"]["qkv"]["kernel"] = arr(w.T)
                elif rest == "attn.qkv.bias":
                    blk["attn"]["qkv"]["bias"] = arr(w)
                elif rest == "attn.proj.weight":
                    blk["attn"]["proj"]["kernel"] = arr(w.T)
                elif rest == "attn.proj.bias":
                    blk["attn"]["proj"]["bias"] = arr(w)
                elif rest in ("mlp.w1.weight", "mlp.fc1.weight"):
                    name = "mlp_w1" if "w1" in rest else "mlp_fc1"
                    blk[name]["kernel"] = arr(w.T)
                elif rest in ("mlp.w1.bias", "mlp.fc1.bias"):
                    name = "mlp_w1" if "w1" in rest else "mlp_fc1"
                    blk[name]["bias"] = arr(w)
                elif rest == "mlp.w2.weight":
                    blk["mlp_w2"]["kernel"] = arr(w.T)
                elif rest == "mlp.w2.bias":
                    blk["mlp_w2"]["bias"] = arr(w)
                elif rest in ("mlp.w3.weight", "mlp.fc2.weight"):
                    name = "mlp_w3" if "w3" in rest else "mlp_fc2"
                    blk[name]["kernel"] = arr(w.T)
                elif rest in ("mlp.w3.bias", "mlp.fc2.bias"):
                    name = "mlp_w3" if "w3" in rest else "mlp_fc2"
                    blk[name]["bias"] = arr(w)
                elif rest == "mlp.w12.weight":
                    # fused: rows [w1; w2] stacked on the output dim
                    h = w.shape[0] // 2
                    blk["mlp_w1"]["kernel"] = arr(w[:h].T)
                    blk["mlp_w2"]["kernel"] = arr(w[h:].T)
                elif rest == "mlp.w12.bias":
                    h = w.shape[0] // 2
                    blk["mlp_w1"]["bias"] = arr(w[:h])
                    blk["mlp_w2"]["bias"] = arr(w[h:])
                else:
                    unmatched.append(k)
            else:
                unmatched.append(k)
        except Exception:
            unmatched.append(k)
    if unmatched:
        print(f"[vit/dinov3] {len(unmatched)} unmatched torch keys, e.g. {unmatched[:5]}")
    return variables
