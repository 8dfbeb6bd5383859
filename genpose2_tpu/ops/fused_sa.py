"""Fused set-abstraction scale kernel: group -> center -> BN-affine -> MLP
chain -> max-pool, VMEM-resident.

The XLA eval path materializes, per SA scale, the grouped activations
(B, M, S, h) in HBM between every op: the one-hot grouping product, the f32
BatchNorm round trip, each SharedMLP matmul, and the final max-pool each
re-read/re-write hundreds of MB. This kernel keeps the whole per-(batch-row,
centroid-tile) computation in VMEM: HBM traffic drops to one read of the
projected points (B, N, h1) and one write of the pooled output (B, M, C_out).

Grouping uses the one-hot MXU product (see ops/grouping.py): for each slot s,
onehot(TM, N) = (idx[:, s] == lane) and g = onehot @ proj — exact 0/1
selection, deterministic.

Eval-only: BatchNorm running statistics are folded into per-layer affines
(a = gamma/sqrt(var+eps), c = beta - mean*a) by the caller
(genpose2_tpu/models/fast_encoder.py). The training path keeps the autodiff'd
XLA formulation in models/pointnet2.py.

reference semantics: pointnet2_modules.py:39-74 (ball query -> group+center ->
SharedMLP -> max-pool), exactly reproduced given the same indices (parity
test: tests/test_ops.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from genpose2_tpu.ops.ball_query_pallas import blocked_prefix_rank


def _kernel(idx_ref, proj_ref, center_ref, *wa_refs, out_ref, nsample, num_layers):
    """One (batch row, centroid tile) program.

    idx_ref (1, TM, S) int32, proj_ref (1, N, h1), center_ref (1, TM, h1),
    wa_refs = [a0, c0, W1, a1, c1, ..., W_{L}, a_L, c_L] (affines (1, h),
    weights (h_in, h_out)), out_ref (1, TM, C_out).
    """
    proj = proj_ref[0]  # (N, h1)
    idx = idx_ref[0]  # (TM, S)
    center = center_ref[0].astype(jnp.float32)  # (TM, h1)
    TM, S = idx.shape
    N = proj.shape[0]

    a0 = wa_refs[0][:]  # (1, h1)
    c0 = wa_refs[1][:]
    layers = []
    for li in range(num_layers):
        W = wa_refs[2 + 3 * li][:]
        a = wa_refs[3 + 3 * li][:]
        c = wa_refs[4 + 3 * li][:]
        layers.append((W, a, c))

    lane = jax.lax.broadcasted_iota(jnp.int32, (TM, N), dimension=1)
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)  # (TM, C_out); relu => >= 0

    for s in range(nsample):
        onehot = (idx[:, s : s + 1] == lane).astype(proj.dtype)  # (TM, N)
        g = jnp.dot(onehot, proj, preferred_element_type=jnp.float32)
        h = jnp.maximum((g - center) * a0 + c0, 0.0)
        for W, a, c in layers:
            z = jnp.dot(h.astype(W.dtype), W, preferred_element_type=jnp.float32)
            h = jnp.maximum(z * a + c, 0.0)
        acc = jnp.maximum(acc, h)

    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("row_tile", "out_dtype"))
def fused_group_mlp_pool(
    proj: jnp.ndarray,
    idx: jnp.ndarray,
    center_proj: jnp.ndarray,
    affines: Sequence,
    weights: Sequence[jnp.ndarray],
    row_tile: int = 128,
    out_dtype=jnp.float32,
):
    """proj (B, N, h1), idx (B, M, S) int32, center_proj (B, M, h1),
    affines = [(a0, c0), (a1, c1), ...] each (h_i,), weights = [W1, ...]
    (h_{i-1} -> h_i) -> (B, M, C_out) where C_out = affines[-1] width.

    Computes, per (object, centroid, slot):
        h = relu((proj[idx] - center_proj) * a0 + c0)
        h = relu((h @ W_i) * a_i + c_i)      for each layer
        out = max over slots.
    """
    B, N, h1 = proj.shape
    M, S = idx.shape[1:]
    num_layers = len(weights)
    assert len(affines) == num_layers + 1
    C_out = affines[-1][0].shape[0]

    TM = min(row_tile, M)
    assert M % TM == 0, (M, TM)

    wa = []
    wa.append(affines[0][0].reshape(1, -1).astype(jnp.float32))
    wa.append(affines[0][1].reshape(1, -1).astype(jnp.float32))
    for li in range(num_layers):
        wa.append(weights[li])
        wa.append(affines[li + 1][0].reshape(1, -1).astype(jnp.float32))
        wa.append(affines[li + 1][1].reshape(1, -1).astype(jnp.float32))

    grid = (B, M // TM)
    wa_specs = [
        pl.BlockSpec(w.shape, lambda b, m, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for w in wa
    ]
    kernel = functools.partial(_kernel, nsample=S, num_layers=num_layers)

    def kernel_entry(idx_ref, proj_ref, center_ref, *rest):
        kernel(idx_ref, proj_ref, center_ref, *rest[:-1], out_ref=rest[-1])

    return pl.pallas_call(
        kernel_entry,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TM, S), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, h1), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, h1), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM),
            *wa_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, TM, C_out), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, M, C_out), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(idx.astype(jnp.int32), proj, center_proj, *wa)


def _sa_scale_kernel(
    x_ref,
    y_ref,
    z_ref,
    cx_ref,
    cy_ref,
    cz_ref,
    proj_ref,
    center_ref,
    *wa_refs,
    out_ref,
    radius,
    nsample,
    n_valid,
    num_layers,
    slot_chunk,
    dynamic_skip,
):
    """Fully fused SA scale: ball query + group + center + affine + MLP + pool.

    Never materializes indices: the grouping one-hot for slot s IS the
    ball-query rank selector (ranksel == s+1), and the CUDA padding rule
    (slots past the hit count replay the first hit; zero-hit rows read point
    0) becomes a post-matmul select on the (TM, h1) grouped values.

    x/y/z (1, 1, N) f32, cx/cy/cz (1, 1, TM) f32, proj (1, N, h1),
    center (1, TM, h1), wa_refs as in _kernel, out (1, TM, C_out).
    """
    x = x_ref[0]  # (1, N)
    y = y_ref[0]
    z = z_ref[0]
    cx = cx_ref[0].reshape(-1, 1)  # (TM, 1)
    cy = cy_ref[0].reshape(-1, 1)
    cz = cz_ref[0].reshape(-1, 1)
    proj = proj_ref[0]  # (N, h1)
    center = center_ref[0].astype(jnp.float32)  # (TM, h1)
    TM = cx.shape[0]
    N = proj.shape[0]

    a0 = wa_refs[0][:]
    c0 = wa_refs[1][:]
    layers = []
    for li in range(num_layers):
        layers.append(
            (wa_refs[2 + 3 * li][:], wa_refs[3 + 3 * li][:], wa_refs[4 + 3 * li][:])
        )

    d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2  # (TM, N)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TM, N), dimension=1)
    maskf = ((d2 < radius * radius) & (lane < n_valid)).astype(jnp.float32)

    rank = blocked_prefix_rank(maskf)
    ranksel = (rank * maskf).astype(jnp.int32)  # hit-rank at hits, 0 elsewhere
    cnt = rank[:, -1:].astype(jnp.int32)  # (TM, 1) total hits

    def mlp(h, ctr):
        h = jnp.maximum((h - ctr) * a0 + c0, 0.0)
        for W, a, c in layers:
            z_ = jnp.dot(h.astype(W.dtype), W, preferred_element_type=jnp.float32)
            h = jnp.maximum(z_ * a + c, 0.0)
        return h

    g_first = jnp.dot(
        (ranksel == 1).astype(proj.dtype), proj, preferred_element_type=jnp.float32
    )
    # zero-hit rows read point 0 (the CUDA output is zero-initialized)
    g_pad = jnp.where(cnt > 0, g_first, proj[0:1].astype(jnp.float32))
    h_pad = mlp(g_pad, center)

    # Slots are processed SC at a time: the SC per-slot one-hot selectors are
    # stacked into one (SC*TM, N) operand so the grouping product and the MLP
    # chain run as few wide matmuls instead of nsample skinny ones (better MXU
    # streaming; the compare cost is identical).
    SC = min(slot_chunk, nsample)
    while nsample % SC:
        SC -= 1
    rank_t = jnp.concatenate([ranksel] * SC, axis=0)  # (SC*TM, N), tile order
    center_t = jnp.concatenate([center] * SC, axis=0)
    cnt_t = jnp.concatenate([cnt] * SC, axis=0)
    h_pad_t = jnp.concatenate([h_pad] * SC, axis=0)
    # slot number of each stacked row (tile order: rows [s*TM:(s+1)*TM])
    srow = jax.lax.broadcasted_iota(jnp.int32, (SC * TM, 1), 0) // TM

    def chunk_val(ci, acc):
        svals = srow + (ci * SC + 1)  # slot index s+1 per stacked row
        onehot = (rank_t == svals).astype(proj.dtype)
        g = jnp.dot(onehot, proj, preferred_element_type=jnp.float32)
        h = mlp(g, center_t)
        h = jnp.where(cnt_t > svals - 1, h, h_pad_t)
        chunk_max = jnp.max(h.reshape(SC, TM, -1), axis=0)
        return jnp.maximum(acc, chunk_max)

    if not dynamic_skip:
        acc = h_pad  # every padded slot produces h_pad
        for ci in range(nsample // SC):
            acc = chunk_val(ci, acc)
        out_ref[0] = acc.astype(out_ref.dtype)
        return

    # every padded slot produces h_pad; out_ref doubles as the accumulator
    out_ref[0] = h_pad.astype(out_ref.dtype)

    # Slots past the tile's max hit count are pure padding (their h is
    # replaced by h_pad, which already seeds the accumulator), so whole chunks
    # are SKIPPED at runtime once ci*SC >= max(cnt) — exact semantics. The
    # loop stays UNROLLED with pl.when predication (a fori_loop + lax.cond
    # formulation measured ~18% slower end-to-end on dense clouds where the
    # skip never fires).
    cnt_max = jnp.max(cnt)

    for ci in range(nsample // SC):

        @pl.when(ci * SC < cnt_max)
        def _(ci=ci):
            out_ref[0] = chunk_val(ci, out_ref[0].astype(jnp.float32)).astype(
                out_ref.dtype
            )


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "nsample", "row_tile", "out_dtype", "slot_chunk", "dynamic_skip",
    ),
)
def fused_sa_scale(
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    proj: jnp.ndarray,
    center_proj: jnp.ndarray,
    affines: Sequence,
    weights: Sequence[jnp.ndarray],
    radius: float,
    nsample: int,
    row_tile: int = 128,
    out_dtype=jnp.float32,
    slot_chunk: int = 8,
    dynamic_skip: bool = False,
):
    """Ball query fused with the grouped MLP: xyz (B, N, 3), new_xyz (B, M, 3),
    proj (B, N, h1), center_proj (B, M, h1) -> (B, M, C_out).

    Equivalent to
        fused_group_mlp_pool(proj, ball_query(xyz, new_xyz, radius, nsample),
                             center_proj, affines, weights)
    without materializing the indices (parity test: tests/test_ops.py)."""
    B, N, h1 = proj.shape
    M = new_xyz.shape[1]
    num_layers = len(weights)
    assert len(affines) == num_layers + 1
    C_out = affines[-1][0].shape[0]

    TM = min(row_tile, M)
    assert M % TM == 0 and (TM % 128 == 0 or TM == M), (M, TM)

    n_valid = N
    Np = ((N + 127) // 128) * 128
    if Np != N:
        xyz = jnp.pad(xyz, ((0, 0), (0, Np - N), (0, 0)), constant_values=1e9)
        proj = jnp.pad(proj, ((0, 0), (0, Np - N), (0, 0)))

    xyz = jax.lax.stop_gradient(xyz).astype(jnp.float32)
    new_xyz = jax.lax.stop_gradient(new_xyz).astype(jnp.float32)
    x = xyz[..., 0][:, None, :]  # (B, 1, Np)
    y = xyz[..., 1][:, None, :]
    z = xyz[..., 2][:, None, :]
    cx = new_xyz[..., 0][:, None, :]  # (B, 1, M)
    cy = new_xyz[..., 1][:, None, :]
    cz = new_xyz[..., 2][:, None, :]

    wa = [
        affines[0][0].reshape(1, -1).astype(jnp.float32),
        affines[0][1].reshape(1, -1).astype(jnp.float32),
    ]
    for li in range(num_layers):
        wa.append(weights[li])
        wa.append(affines[li + 1][0].reshape(1, -1).astype(jnp.float32))
        wa.append(affines[li + 1][1].reshape(1, -1).astype(jnp.float32))
    wa_specs = [
        pl.BlockSpec(w.shape, lambda b, m, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for w in wa
    ]

    grid = (B, M // TM)
    pts_spec = pl.BlockSpec((1, 1, Np), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM)
    ctr_spec = pl.BlockSpec((1, 1, TM), lambda b, m: (b, 0, m), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _sa_scale_kernel,
        radius=radius,
        nsample=nsample,
        n_valid=n_valid,
        num_layers=num_layers,
        slot_chunk=slot_chunk,
        dynamic_skip=dynamic_skip,
    )

    def kernel_entry(*refs):
        kernel(*refs[:-1], out_ref=refs[-1])

    return pl.pallas_call(
        kernel_entry,
        grid=grid,
        in_specs=[
            pts_spec,
            pts_spec,
            pts_spec,
            ctr_spec,
            ctr_spec,
            ctr_spec,
            pl.BlockSpec((1, Np, h1), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, h1), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM),
            *wa_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, TM, C_out), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, M, C_out), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(x, y, z, cx, cy, cz, proj, center_proj, *wa)


def _sa_stage_kernel(*refs, radii, nsamples, n_valid, num_layers, slot_chunk,
                     dynamic_skip, row_batch=1):
    """All MSG scales of one SA stage in a single program.

    The two (or more) scales of an MSG stage share the same xyz/new_xyz, so
    the (TM, N) squared-distance matrix — the largest VPU term of the
    per-scale kernel — is computed ONCE and reused by every scale's radius
    mask. The per-scale outputs are concatenated in VMEM and written as the
    stage's final (1, TM, sum C_s) block, which also removes the XLA-side
    concat copy the per-scale formulation needed.

    refs = [x, y, z, cx, cy, cz,
            (proj_s, center_s, *wa_s) for each scale,
            out_ref,
            (acc_s scratch for each scale, only when dynamic_skip)].
    Per-scale math is identical to _sa_scale_kernel.
    """
    n_scales = len(radii)
    x_ref, y_ref, z_ref, cx_ref, cy_ref, cz_ref = refs[:6]
    pos = 6
    scales = []
    for s in range(n_scales):
        proj_ref, center_ref = refs[pos], refs[pos + 1]
        pos += 2
        nw = 2 + 3 * num_layers[s]
        scales.append((proj_ref, center_ref, refs[pos : pos + nw]))
        pos += nw
    out_ref = refs[pos]
    accs = refs[pos + 1 :] if dynamic_skip else None

    # row_batch > 1 packs several batch rows into one program (small
    # stages: M == TM makes the grid B programs of little work each, and
    # per-program overhead rivals the math). Rows run sequentially so the
    # live plane set stays per-row; scratch-based dynamic_skip requires
    # row_batch == 1 (asserted by the caller).
    for r in range(row_batch):
        x = x_ref[r]  # (1, N)
        y = y_ref[r]
        z = z_ref[r]
        cx = cx_ref[r].reshape(-1, 1)  # (TM, 1)
        cy = cy_ref[r].reshape(-1, 1)
        cz = cz_ref[r].reshape(-1, 1)
        TM = cx.shape[0]
        N = x.shape[1]

        d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2  # (TM, N), shared
        lane = jax.lax.broadcasted_iota(jnp.int32, (TM, N), dimension=1)
        valid = lane < n_valid

        outs = []
        for s, (proj_ref, center_ref, wa) in enumerate(scales):
            proj = proj_ref[r]  # (N, h1_s)
            center = center_ref[r].astype(jnp.float32)  # (TM, h1_s)
            radius = radii[s]
            ns = nsamples[s]

            a0 = wa[0][:]
            c0 = wa[1][:]
            layers = [
                (wa[2 + 3 * li][:], wa[3 + 3 * li][:], wa[4 + 3 * li][:])
                for li in range(num_layers[s])
            ]

            maskf = ((d2 < radius * radius) & valid).astype(jnp.float32)
            rank = blocked_prefix_rank(maskf)
            ranksel = (rank * maskf).astype(jnp.int32)
            cnt = rank[:, -1:].astype(jnp.int32)

            def mlp(h, ctr, a0=a0, c0=c0, layers=layers):
                h = jnp.maximum((h - ctr) * a0 + c0, 0.0)
                for W, a, c in layers:
                    z_ = jnp.dot(h.astype(W.dtype), W, preferred_element_type=jnp.float32)
                    h = jnp.maximum(z_ * a + c, 0.0)
                return h

            g_first = jnp.dot(
                (ranksel == 1).astype(proj.dtype), proj, preferred_element_type=jnp.float32
            )
            g_pad = jnp.where(cnt > 0, g_first, proj[0:1].astype(jnp.float32))
            h_pad = mlp(g_pad, center)

            SC = min(slot_chunk, ns)
            while ns % SC:
                SC -= 1
            rank_t = jnp.concatenate([ranksel] * SC, axis=0)  # (SC*TM, N)
            center_t = jnp.concatenate([center] * SC, axis=0)
            cnt_t = jnp.concatenate([cnt] * SC, axis=0)
            h_pad_t = jnp.concatenate([h_pad] * SC, axis=0)
            srow = jax.lax.broadcasted_iota(jnp.int32, (SC * TM, 1), 0) // TM

            def chunk_val(ci, acc, proj=proj, rank_t=rank_t, center_t=center_t,
                          cnt_t=cnt_t, h_pad_t=h_pad_t, srow=srow, SC=SC, mlp=mlp):
                svals = srow + (ci * SC + 1)
                onehot = (rank_t == svals).astype(proj.dtype)
                g = jnp.dot(onehot, proj, preferred_element_type=jnp.float32)
                h = mlp(g, center_t)
                h = jnp.where(cnt_t > svals - 1, h, h_pad_t)
                chunk_max = jnp.max(h.reshape(SC, TM, -1), axis=0)
                return jnp.maximum(acc, chunk_max)

            if not dynamic_skip:
                acc = h_pad
                for ci in range(ns // SC):
                    acc = chunk_val(ci, acc)
                outs.append(acc)
            else:
                # same runtime chunk skip as _sa_scale_kernel, accumulating in a
                # per-scale f32 VMEM scratch (predicated blocks must write refs)
                accs[s][...] = h_pad
                cnt_max = jnp.max(cnt)
                for ci in range(ns // SC):

                    @pl.when(ci * SC < cnt_max)
                    def _(ci=ci, s=s, chunk_val=chunk_val):
                        accs[s][...] = chunk_val(ci, accs[s][...])

                outs.append(None)

        if dynamic_skip:
            outs = [accs[s][...] for s in range(n_scales)]
        out_ref[r] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radii", "nsamples", "row_tile", "out_dtype", "slot_chunk", "dynamic_skip",
    ),
)
def fused_sa_stage(
    xyz: jnp.ndarray,
    new_xyz: jnp.ndarray,
    projs: Sequence[jnp.ndarray],
    center_projs: Sequence[jnp.ndarray],
    affines_list: Sequence[Sequence],
    weights_list: Sequence[Sequence[jnp.ndarray]],
    radii: Sequence[float],
    nsamples: Sequence[int],
    row_tile: int = 128,
    out_dtype=jnp.float32,
    slot_chunk: int = 8,
    dynamic_skip: bool = False,
):
    """Every MSG scale of one SA stage in one kernel launch.

    Equivalent to concatenating fused_sa_scale over the scales
    (parity test: tests/test_ops.py::TestFusedSAStage), but the shared
    (TM, N) distance matrix is computed once and the concat happens in VMEM.

    projs[s] (B, N, h1_s), center_projs[s] (B, M, h1_s), affines_list[s] /
    weights_list[s] as in fused_sa_scale, radii/nsamples static tuples
    -> (B, M, sum_s C_out_s).
    """
    radii = tuple(float(r) for r in radii)
    nsamples = tuple(int(n) for n in nsamples)
    n_scales = len(radii)
    assert len(projs) == len(center_projs) == n_scales
    assert len(affines_list) == len(weights_list) == n_scales
    B, N, _ = projs[0].shape
    M = new_xyz.shape[1]
    num_layers = tuple(len(w) for w in weights_list)
    for s in range(n_scales):
        assert len(affines_list[s]) == num_layers[s] + 1, (
            f"scale {s}: {len(affines_list[s])} affines for {num_layers[s]} layers"
        )
    c_outs = [affines_list[s][-1][0].shape[0] for s in range(n_scales)]
    C_out = sum(c_outs)

    TM = min(row_tile, M)
    assert M % TM == 0 and (TM % 128 == 0 or TM == M), (M, TM)

    # VMEM budget guard: the one-launch stage keeps every scale's (Np, h1_s)
    # proj block plus its chunk temporaries resident at once. For configs much
    # larger than the flagship shapes this can exceed the ~16 MB/core VMEM
    # (relpe_attention sizes its tile the same way); estimate the footprint
    # and fall back to the per-scale kernels (identical math, parity-tested)
    # rather than fail in Mosaic.
    Np_est = ((N + 127) // 128) * 128
    est = (3 * Np_est + 3 * TM) * 4 + TM * C_out * 8  # coords + out (+scratch)
    est += 6 * TM * Np_est * 4  # shared d2/lane/valid/maskf/rank/ranksel
    transient = 0  # scales run sequentially; count the widest one
    for s in range(n_scales):
        h1 = projs[s].shape[-1]
        sc = min(slot_chunk, nsamples[s])
        widths = [h1] + [a[0].shape[0] for a in affines_list[s][1:]]
        est += Np_est * h1 * projs[s].dtype.itemsize  # resident proj block
        est += TM * h1 * 4  # center block
        est += sum(w.size * w.dtype.itemsize for w in weights_list[s])
        transient = max(
            transient,
            sc * TM * (Np_est * (4 + projs[s].dtype.itemsize)  # rank_t + onehot
                       + 4 * max(widths) * 4),  # center/h_pad/g/h rows
        )
    est += transient
    if est > 12 * 1024 * 1024:  # leave headroom under the 16 MB core VMEM
        return jnp.concatenate(
            [
                fused_sa_scale(
                    xyz, new_xyz, projs[s], center_projs[s], affines_list[s],
                    weights_list[s], radii[s], nsamples[s], row_tile=row_tile,
                    out_dtype=out_dtype, slot_chunk=slot_chunk,
                    dynamic_skip=dynamic_skip,
                )
                for s in range(n_scales)
            ],
            axis=-1,
        )

    n_valid = N
    Np = ((N + 127) // 128) * 128
    if Np != N:
        xyz = jnp.pad(xyz, ((0, 0), (0, Np - N), (0, 0)), constant_values=1e9)
        projs = [jnp.pad(p, ((0, 0), (0, Np - N), (0, 0))) for p in projs]

    # Small-stage row batching (kernel supports row_batch > 1) is DISABLED:
    # measured on v5e, Mosaic does NOT serialize the unrolled row loop's
    # temporaries — RB=2 at the flagship stage 3 allocated 28.11M of scoped
    # VMEM (vs 16M limit; the resident+single-row-transient model predicted
    # ~9M), i.e. the chunk temporaries of both rows are live at once and the
    # grid saving cannot be bought within the VMEM budget at these shapes.
    RB = 1

    xyz = jax.lax.stop_gradient(xyz).astype(jnp.float32)
    new_xyz = jax.lax.stop_gradient(new_xyz).astype(jnp.float32)
    coord_ins = [xyz[..., i][:, None, :] for i in range(3)]  # (B, 1, Np)
    coord_ins += [new_xyz[..., i][:, None, :] for i in range(3)]  # (B, 1, M)

    pts_spec = pl.BlockSpec((RB, 1, Np), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM)
    ctr_spec = pl.BlockSpec((RB, 1, TM), lambda b, m: (b, 0, m), memory_space=pltpu.VMEM)
    ins = list(coord_ins)
    in_specs = [pts_spec, pts_spec, pts_spec, ctr_spec, ctr_spec, ctr_spec]
    for s in range(n_scales):
        h1 = projs[s].shape[-1]
        ins.append(projs[s])
        in_specs.append(
            pl.BlockSpec((RB, Np, h1), lambda b, m: (b, 0, 0), memory_space=pltpu.VMEM)
        )
        ins.append(center_projs[s])
        in_specs.append(
            pl.BlockSpec((RB, TM, h1), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM)
        )
        wa = [
            affines_list[s][0][0].reshape(1, -1).astype(jnp.float32),
            affines_list[s][0][1].reshape(1, -1).astype(jnp.float32),
        ]
        for li in range(num_layers[s]):
            wa.append(weights_list[s][li])
            wa.append(affines_list[s][li + 1][0].reshape(1, -1).astype(jnp.float32))
            wa.append(affines_list[s][li + 1][1].reshape(1, -1).astype(jnp.float32))
        ins.extend(wa)
        in_specs.extend(
            pl.BlockSpec(w.shape, lambda b, m, nd=w.ndim: (0,) * nd,
                         memory_space=pltpu.VMEM)
            for w in wa
        )

    kernel = functools.partial(
        _sa_stage_kernel,
        radii=radii,
        nsamples=nsamples,
        n_valid=n_valid,
        num_layers=num_layers,
        slot_chunk=slot_chunk,
        dynamic_skip=dynamic_skip,
        row_batch=RB,
    )
    scratch_shapes = (
        [pltpu.VMEM((TM, c), jnp.float32) for c in c_outs] if dynamic_skip else []
    )

    return pl.pallas_call(
        kernel,
        grid=(B // RB, M // TM),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (RB, TM, C_out), lambda b, m: (b, m, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, M, C_out), out_dtype),
        scratch_shapes=scratch_shapes,
        interpret=jax.default_backend() != "tpu",
    )(*ins)


def fused_group_mlp_pool_reference(proj, idx, center_proj, affines, weights):
    """Dense-jnp oracle for the kernel (same math, XLA ops)."""
    from genpose2_tpu.ops.grouping import group_points

    g = group_points(proj.astype(jnp.float32), idx)  # (B, M, S, h1)
    h = g - center_proj[:, :, None, :].astype(jnp.float32)
    a0, c0 = affines[0]
    h = jnp.maximum(h * a0 + c0, 0.0)
    for W, (a, c) in zip(weights, affines[1:]):
        h = jnp.maximum(h @ W.astype(jnp.float32) * a + c, 0.0)
    return jnp.max(h, axis=2)
