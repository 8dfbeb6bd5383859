"""Fused relative-PE attention kernel (eval fast path for the Fus encoder).

The XLA formulation (models/attention.py) materializes, at stage 0 of the
flagship encoder (B=64, M=512), about 1 GB of HBM intermediates per batch:
the (B, M, M, 3) relative offsets, the (B, M, M, 16) distance/direction MLP
hiddens, the (B, H, M, M) bias, and the (B, H, M, M) attention scores —
measured 13.7 ms for rel-PE + attention at that shape. This kernel computes,
per (batch row, query tile), the bias TILE on the fly from xyz (VPU), adds it
to the q k^T scores, and finishes softmax(scores) @ v — HBM traffic drops to
one read of q/k/v/xyz and one write of the output.

Math identical to EfficientRelativePositionalEncoding (+ fusion layer, both
use_distance and use_direction on) feeding MultiheadAttentionWithRelativePE
(reference: networks/pts_encoder/attention.py:648-735, :414-488): per (i, j),
rel = xyz_j - xyz_i,
  db  = relu(|rel| @ W1d + b1d) @ W2d + b2d               (8)
  dr  = relu((rel/(|rel|+1e-7)) @ W1r + b1r) @ W2r + b2r  (8)
  bias_h = concat(db, dr) @ Wf[:, h] + bf[h]
  out = softmax(q k^T / sqrt(D) + bias) v.

The three linear bias stages are folded outside the kernel: since
bias = (concat(db, dr)) @ Wf is linear in db/dr, precompute
Wfd = W2d @ Wf[:8], Wfr = W2r @ Wf[8:], bc = b2d@Wf[:8] + b2r@Wf[8:] + bf,
so the kernel accumulates the H per-head bias planes directly in the
16-channel loop. At the production config (H=8, nb=8, config.py) the
accumulate cost is the same 2*H = 2*nb = 16 FMAs/channel; the saving is the
eliminated per-head RE-MIX pass (~1.5x fewer bias plane ops overall) and the
bias state shrinking from 2*nb = 16 planes to H = 8 (2x VMEM). For H < 8 the
fold wins proportionally more. The fold itself is exact — no nonlinearity
follows the second Linear (reference: attention.py:648-735).

Parity vs the XLA modules is asserted in tests/test_ops.py; Mosaic lowering
of this folded form at the flagship stage-0 shape is exercised on real TPU
hardware by scripts/verify_relpe_tpu.py (see its header for the recorded
result).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HID = 16  # distance/direction encoder hidden width (reference: attention.py:661-672)


def _kernel(
    qx_ref, qy_ref, qz_ref, kx_ref, ky_ref, kz_ref,
    q_ref, k_ref, v_ref,
    w1d_ref, b1d_ref, w1r_ref, b1r_ref,
    wfd_ref, wfr_ref, bc_ref,
    out_ref,
    *, scale, n_valid,
):
    """One (batch-row block, query tile): q (RB, H, TQ, D), k/v (RB, H, M, D),
    qx.. (RB, TQ, 1) sublane-major, kx.. (RB, 1, M) lane-major,
    out (RB, H, TQ, D). RB batch rows share one program: at the flagship
    stage-0 shape (B=64, M=512, TQ=64) the RB=1 grid was 512 programs whose
    per-program overhead was ~30% of the stage (3.2 ms vs the ~2.2 ms VPU
    bias-mix floor); rows are processed sequentially so the live plane set
    per row is unchanged."""
    RB = q_ref.shape[0]
    H, TQ, D = q_ref.shape[1:]
    M = k_ref.shape[2]

    w1d = w1d_ref[:]  # (1, 16)
    b1d = b1d_ref[:]
    w1r = w1r_ref[:]  # (3, 16)
    b1r = b1r_ref[:]
    wfd = wfd_ref[:]  # (16, H): W2d @ Wf[:8], folded outside the kernel
    wfr = wfr_ref[:]  # (16, H): W2r @ Wf[8:]
    bc = bc_ref[:]  # (1, H): b2d@Wf[:8] + b2r@Wf[8:] + bf

    # key-side padding mask (M padded to a lane multiple)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, M), dimension=1)
    neg = jnp.float32(-1e30)

    for r in range(RB):
        qx = qx_ref[r]  # (TQ, 1)
        qy = qy_ref[r]
        qz = qz_ref[r]
        kx = kx_ref[r]  # (1, M)
        ky = ky_ref[r]
        kz = kz_ref[r]

        # rel[i, j] = xyz_j - xyz_i (reference: attention.py:707)
        rx = kx - qx  # (TQ, M)
        ry = ky - qy
        rz = kz - qz
        dist = jnp.sqrt(rx * rx + ry * ry + rz * rz)
        inv = 1.0 / (dist + 1e-7)
        ux, uy, uz = rx * inv, ry * inv, rz * inv

        # per-head bias planes accumulated directly in the channel loop
        biases = [jnp.full((TQ, M), bc[0, h]) for h in range(H)]
        for c in range(_HID):
            hd = jnp.maximum(dist * w1d[0, c] + b1d[0, c], 0.0)
            hr = jnp.maximum(
                ux * w1r[0, c] + uy * w1r[1, c] + uz * w1r[2, c] + b1r[0, c], 0.0
            )
            for h in range(H):
                biases[h] = biases[h] + hd * wfd[c, h] + hr * wfr[c, h]

        for h in range(H):
            bias = biases[h]
            qh = q_ref[r, h]  # (TQ, D)
            kh = k_ref[r, h]  # (M, D)
            scores = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale + bias
            scores = jnp.where(lane < n_valid, scores, neg)
            smax = jnp.max(scores, axis=1, keepdims=True)
            p = jnp.exp(scores - smax)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            out_ref[r, h] = jnp.dot(
                p.astype(v_ref.dtype), v_ref[r, h], preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "compute_dtype"))
def relpe_attention(xyz, q, k, v, pe_params, num_heads: int,
                    compute_dtype: str = "float32"):
    """xyz (B, M, 3); q, k, v (B, M, C) pre-projected (wq/wk/wv applied by the
    caller); pe_params = EfficientRelativePositionalEncoding param tree
    (Dense_0..Dense_4) -> (B, M, C) attention output (before wo).

    Equivalent to
        bias = EfficientRelativePositionalEncoding(H)(xyz)
        softmax(split_heads(q) split_heads(k)^T / sqrt(D) + bias) split_heads(v)
    without materializing any (B, *, M, M) tensor.

    ``compute_dtype='bfloat16'`` stores q/k/v bf16 so the per-head score and
    value matmuls stream through the MXU at bf16 rate with f32 accumulation;
    the bias/softmax arithmetic stays f32 (it is VPU-bound either way).
    """
    B, M, C = q.shape
    H = num_heads
    D = C // H
    cdt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32

    Mp = ((M + 127) // 128) * 128
    # VMEM stack budget: the kernel holds H bias planes + ~10 temporary
    # (TQ, M) planes. At H=8, M=512 a TQ=128 tile needs ~18.5 MB of scoped
    # VMEM — over the 16 MB/core limit (measured: Mosaic AOT OOM on v5e).
    # TQ=64 halves every TQxM plane and compiles with headroom.
    TQ = min(128 if num_heads <= 4 else 64, Mp)
    xyz = jax.lax.stop_gradient(xyz).astype(jnp.float32)
    if Mp != M:
        xyz = jnp.pad(xyz, ((0, 0), (0, Mp - M), (0, 0)), constant_values=1e6)
        q = jnp.pad(q, ((0, 0), (0, Mp - M), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, Mp - M), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Mp - M), (0, 0)))

    def heads(t):  # (B, Mp, C) -> (B, H, Mp, D)
        return t.reshape(B, Mp, H, D).transpose(0, 2, 1, 3).astype(cdt)

    qh, kh, vh = heads(q), heads(k), heads(v)
    # query-side coordinates sublane-major (B, Mp, 1) so a TQ < 128 tile is a
    # legal block (lane dim 1 == full array); key-side stay lane-major
    xq_, yq_, zq_ = (xyz[..., i][:, :, None] for i in range(3))  # (B, Mp, 1)
    x_, y_, z_ = (xyz[..., i][:, None, :] for i in range(3))  # (B, 1, Mp)

    p = jax.tree.map(lambda a: a.astype(jnp.float32), pe_params)
    nb = p["Dense_1"]["kernel"].shape[1]  # 8 (per-encoder bias width)
    wf = p["Dense_4"]["kernel"]  # (2*nb, H)
    # fold the linear bias stages: concat(db, dr) @ Wf + bf with
    # db = relu(hd) @ W2d + b2d is linear in the hidden planes, so mix the
    # W2/Wf/b2/bf constants on the host and hand the kernel per-channel
    # per-head coefficients
    wa = [
        p["Dense_0"]["kernel"].reshape(1, _HID),
        p["Dense_0"]["bias"].reshape(1, _HID),
        p["Dense_2"]["kernel"],
        p["Dense_2"]["bias"].reshape(1, _HID),
        p["Dense_1"]["kernel"] @ wf[:nb],  # (16, H)
        p["Dense_3"]["kernel"] @ wf[nb:],  # (16, H)
        (
            p["Dense_1"]["bias"] @ wf[:nb]
            + p["Dense_3"]["bias"] @ wf[nb:]
            + p["Dense_4"]["bias"]
        ).reshape(1, H),
    ]
    wa_specs = [
        pl.BlockSpec(w.shape, lambda b, m, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for w in wa
    ]

    # batch-row blocking: halves the program count (the per-program overhead
    # at TQ=64 measured ~30% of stage 0). Mosaic keeps the unrolled rows'
    # transient planes live, so RB multiplies the per-row scoped-VMEM cost.
    # Measured on v5e (16M scoped limit): bf16 flagship stages compile at
    # RB=2 and win ~0.7 ms (RB=4 hits 19.75M, compile OOM); the f32 path at
    # (Mp=512, D=32) already hits 18.38M at RB=2
    # (scripts/verify_relpe_tpu.py) — f32 keeps the per-program form. The
    # per-row footprint model is calibrated to the RB=4 OOM measurement
    # (19.75M / 4 rows ~ 4.9M at TQ=64, Mp=512, D=12 bf16 => ~38 live
    # (TQ, Mp) f32 planes + the q/k/v head blocks), so larger-M bf16
    # configs fall back to RB=1 instead of failing Mosaic compile.
    # A lax.fori_loop row body (transients allocated once, not per unrolled
    # row) was measured as an alternative: it does NOT lift the cap (RB=4
    # still fails Mosaic compile at M=512/256) and the dynamic-r ref
    # indexing costs 3-8% at every flagship stage (e.g. M=512: 3.92 ms
    # unrolled-RB2 vs 4.11 fori-RB2; M=128: 0.97 vs 1.04) — keep unrolled.
    per_row = 38 * TQ * Mp * 4 + 3 * H * Mp * D * (2 if cdt == jnp.bfloat16 else 4)
    RB = (
        2
        if (B % 2 == 0 and cdt == jnp.bfloat16 and 2 * per_row <= 11_500_000)
        else 1
    )
    grid = (B // RB, Mp // TQ)
    qrow_spec = pl.BlockSpec((RB, TQ, 1), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM)
    krow_spec = pl.BlockSpec((RB, 1, Mp), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=1.0 / (D**0.5), n_valid=M),
        grid=grid,
        in_specs=[
            qrow_spec, qrow_spec, qrow_spec,
            krow_spec, krow_spec, krow_spec,
            pl.BlockSpec((RB, H, TQ, D), lambda b, m: (b, 0, m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, H, Mp, D), lambda b, m: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, H, Mp, D), lambda b, m: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            *wa_specs,
        ],
        out_specs=pl.BlockSpec(
            (RB, H, TQ, D), lambda b, m: (b, 0, m, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, Mp, D), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(xq_, yq_, zq_, x_, y_, z_, qh, kh, vh, *wa)

    return out.transpose(0, 2, 1, 3).reshape(B, Mp, C)[:, :M]
