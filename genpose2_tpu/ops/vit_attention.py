"""Fused multi-head self-attention kernel for the frozen ViT backbone.

The XLA formulation of DinoV3Attention (models/vit.py) materializes the
(B, H, N, N) attention scores in HBM twice (scores out of the QK einsum,
probabilities back in for the AV einsum) and needs head-major transposes of
q/k/v on either side. At the flagship shape (B=64 crops, N=261 tokens,
H=6 heads) that is ~2.5 GB of HBM round trips per forward — the measured ViT
time (26.9 ms steady-state) is ~5x its bf16 matmul roofline.

This kernel computes, per batch row, all heads' softmax(QK^T/sqrt(d)) V in
VMEM: HBM traffic drops to one read of q/k/v (token-major, exactly as the
fused qkv projection produces them) and one write of the attention output.
No transposes are materialized: the head split is a static lane slice, the
K-contraction runs as a dot_general over the head dim.

Numerics match the XLA path: bf16 (or f32) matmul inputs, f32 accumulation,
f32 softmax, probabilities cast back to the compute dtype for the AV product.
Padded key columns are masked with a large negative before the softmax;
padded query rows produce garbage that the caller slices off.

reference behavior: /root/reference's torch ViT runs standard SDPA inside
dinov3 blocks (networks/posenet.py:56-62 loads the hub model); this kernel is
the TPU-native equivalent of its attention core.

Parity: tests/test_ops.py::TestViTAttention (CPU interpret mode vs the dense
jnp oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, out_ref, *, num_heads, head_dim, n_valid):
    """One batch row, all heads: q/k/v (H, Np, hd) -> out (H, Np, hd).

    Head-major blocks: the per-head split happens OUTSIDE the kernel (one
    XLA transpose fused with the padding) and heads index the LEADING block
    dim — 64-wide lane slicing inside the kernel forces Mosaic relayouts that
    measured slower than the XLA einsum path, and a one-head-per-program grid
    (B*H programs) measured ~11 ms at the flagship shape from per-program
    overheads alone. One program per batch row chains the H head matmuls
    back-to-back in VMEM.
    """
    scale = 1.0 / (head_dim ** 0.5)
    Np = q_ref.shape[1]

    # key-padding mask: one (1, Np) row, broadcast over query rows
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Np), dimension=1)
    neg = jnp.where(lane < n_valid, 0.0, -1e9).astype(jnp.float32)

    for h in range(num_heads):
        q = q_ref[h]  # (Np, hd)
        k = k_ref[h]
        v = v_ref[h]
        # (Np, hd) x (Np, hd) -> (Np, Np), contracting the head dim
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        scores = scores * scale + neg
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        out_ref[h] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "out_dtype", "n_valid"))
def vit_attention(q, k, v, num_heads: int, out_dtype=jnp.float32, n_valid=None):
    """q, k, v (B, N, D) token-major (D = num_heads * head_dim) ->
    (B, N, D) f32 (or ``out_dtype``) multi-head attention output.

    Equivalent to softmax(q_h k_h^T / sqrt(hd)) v_h per head with heads taken
    as contiguous D-slices — exactly the layout the fused qkv projection
    emits, so no head-major transpose exists on either side.

    ``n_valid``: number of real tokens when the caller already padded N to
    the sublane tile (DinoV3ViT pads ONCE for all 12 blocks instead of
    paying a pad+slice per block); keys >= n_valid are masked, query rows
    >= n_valid produce garbage the caller slices off at the very end.
    """
    B, N, D = q.shape
    assert D % num_heads == 0
    H = num_heads
    hd = D // H
    n_valid = N if n_valid is None else n_valid
    # sublane tile: 8 for f32, 16 for bf16 (and other sub-f32 dtypes)
    sublane = 8 if q.dtype == jnp.float32 else 16
    Np = _round_up(N, sublane)

    def to_head_major(t):
        t = t.reshape(B, N, H, hd).transpose(0, 2, 1, 3).reshape(B * H, N, hd)
        if Np != N:
            t = jnp.pad(t, ((0, 0), (0, Np - N), (0, 0)))
        return t

    spec = pl.BlockSpec((H, Np, hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=H, head_dim=hd, n_valid=n_valid),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Np, hd), out_dtype),
        # Mosaic lowering only exists on TPU; interpret everywhere else
        # (CPU tests, any hypothetical GPU backend).
        interpret=jax.default_backend() != "tpu",
    )(to_head_major(q), to_head_major(k), to_head_major(v))
    out = out[:, :N].reshape(B, H, N, hd).transpose(0, 2, 1, 3)
    return out.reshape(B, N, D)


def _kernel_tm(*refs, num_heads, head_dim, n_valid, rope):
    """Token-major variant: q/k/v (RB, Np, D) stay in the layout the qkv
    matmul produced; the per-head split is a static 64-lane VMEM-ref slice
    INSIDE the kernel instead of an XLA head-major transpose outside (the
    transposes measured ~2 ms/fwd as 48 'copy' ops at the flagship shape).
    Odd heads cost a lane rotation on load/store; even heads are tile-aligned.
    RB batch rows share one program (per-program overhead x B measured larger
    than the whole attention math at the flagship shape).

    With ``rope``, sin/cos (Np, hd) refs follow v and RoPE is applied to the
    q/k head blocks HERE, in VMEM: the rotate-half is a 32-lane half-swap on
    a (Np, hd) block — this removes the folded rot(q)/rot(k) projection
    columns (2D of 5D, ~10% of the block's matmul FLOPs) and the two
    (B, N, D) elementwise passes that built roped q/k through HBM.
    """
    if rope:
        q_ref, k_ref, v_ref, sin_ref, cos_ref, out_ref = refs
        sin = sin_ref[...]  # (Np, hd) f32
        cos = cos_ref[...]
    else:
        q_ref, k_ref, v_ref, out_ref = refs
    RB, Np, _ = q_ref.shape
    scale = 1.0 / (head_dim ** 0.5)
    h2 = head_dim // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, Np), dimension=1)
    neg = jnp.where(lane < n_valid, 0.0, -1e9).astype(jnp.float32)

    def roped(x):
        xf = x.astype(jnp.float32)
        rot = jnp.concatenate([-xf[:, h2:], xf[:, :h2]], axis=1)
        return (xf * cos + rot * sin).astype(x.dtype)

    for r in range(RB):
        for h in range(num_heads):
            sl = pl.dslice(h * head_dim, head_dim)
            q = q_ref[r, :, sl]  # (Np, hd)
            k = k_ref[r, :, sl]
            v = v_ref[r, :, sl]
            if rope:
                q = roped(q)
                k = roped(k)
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            scores = scores * scale + neg
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
            out_ref[r, :, sl] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "out_dtype", "n_valid", "rows_per_program")
)
def vit_attention_tm(q, k, v, num_heads: int, out_dtype=jnp.float32, n_valid=None,
                     rows_per_program: int = 4, sin=None, cos=None):
    """Token-major fused attention: (B, N, D) in, (B, N, D) out, no XLA
    transposes. Requires N already padded to the sublane tile (the DinoV3ViT
    whole-network pad). Optional ``sin``/``cos`` (N, head_dim) apply RoPE to
    q/k inside the kernel (identical for every head — DINOv3 convention).
    Parity: tests/test_ops.py::TestViTAttention."""
    B, N, D = q.shape
    assert D % num_heads == 0
    hd = D // num_heads
    n_valid = N if n_valid is None else n_valid
    sublane = 8 if q.dtype == jnp.float32 else 16
    assert N % sublane == 0, (N, sublane)
    RB = rows_per_program
    while B % RB:
        RB -= 1
    rope = sin is not None

    spec = pl.BlockSpec((RB, N, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [spec, spec, spec]
    ins = [q, k, v]
    if rope:
        tab_spec = pl.BlockSpec(
            (N, hd), lambda b: (0, 0), memory_space=pltpu.VMEM
        )
        in_specs += [tab_spec, tab_spec]
        ins += [sin.astype(jnp.float32), cos.astype(jnp.float32)]
    return pl.pallas_call(
        functools.partial(
            _kernel_tm, num_heads=num_heads, head_dim=hd, n_valid=n_valid,
            rope=rope,
        ),
        grid=(B // RB,),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, D), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(*ins)


def vit_attention_reference(q, k, v, num_heads: int):
    """Dense-jnp oracle (same math, XLA ops)."""
    B, N, D = q.shape
    hd = D // num_heads
    qh = q.reshape(B, N, num_heads, hd)
    kh = k.reshape(B, N, num_heads, hd)
    vh = v.reshape(B, N, num_heads, hd)
    att = jnp.einsum(
        "bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32
    ) / (hd ** 0.5)
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", att.astype(vh.dtype), vh,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, N, D)
