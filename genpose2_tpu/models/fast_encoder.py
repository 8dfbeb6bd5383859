"""Eval fast path for the PointNet++ MSG encoder: the SA stack re-run through
the fused Pallas scale kernel (ops/fused_sa.py).

Same pattern as models/scorenet.py:make_fast_score_fn — a pure function over
the bound module's variables, algebraically equal to
``PointNet2ClsMSG.apply(..., train=False)``, restructured for the hardware:

- eval-mode BatchNorms are folded into per-layer affines;
- per SA scale, grouping + centering + affine + SharedMLP chain + max-pool run
  in one VMEM-resident kernel (the module path materializes the (B, M, S, h)
  grouped activations in HBM between each of those ops);
- matmuls run in the config's compute dtype (params stay f32).

Parity asserted in tests/test_models.py::test_fast_cls_forward_parity.
The training path (autodiff, batch-stat updates) keeps the module forward.

reference: networks/pts_encoder/pointnet2.py:211-252 (Pointnet2ClsMSG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from genpose2_tpu.config import PointNet2Config
from genpose2_tpu.ops import furthest_point_sample, gather_points
from genpose2_tpu.ops.ball_query_pallas import ball_count
from genpose2_tpu.ops.fused_sa import fused_sa_stage
from genpose2_tpu.ops.layernorm import fast_residual_layernorm
from genpose2_tpu.ops.relpe_attention import relpe_attention

_BN_EPS = 1e-5
_LN_EPS = 1e-6  # flax nn.LayerNorm default


def _layernorm(x, p):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + _LN_EPS) * p["scale"] + p["bias"]


def _fold_bn(bn_params, bn_stats):
    """Eval-mode BatchNorm -> (a, c) with y = a*x + c."""
    a = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + _BN_EPS)
    c = bn_params["bias"] - bn_stats["mean"] * a
    return a, c


def _fast_gaf(p, s, current, original, dt):
    """Eval-path GatedAttentionFusion as a pure function: BatchNorms folded
    into affines, matmuls in the compute dtype with f32 accumulation, the
    concat-matmuls split into half-matmuls, and the k=7 spatial-attention
    conv expanded to shifted FMAs on (B, M) planes. Algebraically equal to
    ``GatedAttentionFusion(C).apply(..., train=False)`` (parity:
    tests/test_models.py::test_fast_gaf_parity).

    reference semantics: networks/pts_encoder/attention.py:224-325."""
    from genpose2_tpu.models.layers import linear_resize_points

    C = current.shape[-1]
    if original.shape[1] != current.shape[1]:
        original = linear_resize_points(original, current.shape[1])

    def mm(a, w):
        return jnp.dot(a.astype(dt), w.astype(dt),
                       preferred_element_type=jnp.float32)

    # original transform: Dense + BN + relu
    a0, c0 = _fold_bn(p["BatchNorm_0"], s["BatchNorm_0"])
    orig_t = jnp.maximum(
        (mm(original, p["Dense_0"]["kernel"]) + p["Dense_0"]["bias"]) * a0 + c0, 0.0
    )

    # channel attention: mean over points of concat == concat of the means
    pooled = jnp.concatenate(
        [jnp.mean(current, axis=1, keepdims=True),
         jnp.mean(orig_t, axis=1, keepdims=True)],
        axis=-1,
    )
    ca = jax.nn.relu(mm(pooled, p["Dense_1"]["kernel"]) + p["Dense_1"]["bias"])
    ca = jax.nn.sigmoid(
        (mm(ca, p["Dense_2"]["kernel"]) + p["Dense_2"]["bias"]).astype(jnp.float32)
    )  # (B, 1, C)

    # spatial attention: k=7 SAME conv over [max_c, mean_c] along points
    M = current.shape[1]
    mx = jnp.max(current, axis=-1)  # (B, M)
    av = jnp.mean(current, axis=-1)
    kern = p["Conv_0"]["kernel"].astype(jnp.float32)  # (7, 2, 1)
    mxp = jnp.pad(mx, ((0, 0), (3, 3)))
    avp = jnp.pad(av, ((0, 0), (3, 3)))
    logit = jnp.zeros_like(mx)
    for i in range(7):
        logit = logit + mxp[:, i : i + M] * kern[i, 0, 0]
        logit = logit + avp[:, i : i + M] * kern[i, 1, 0]
    sa = jax.nn.sigmoid(logit)[..., None]  # (B, M, 1)

    attended = orig_t * ca * sa

    # gate: Dense over concat(current, attended) -> two half-matmuls; BN folded
    ag, cg = _fold_bn(p["BatchNorm_1"], s["BatchNorm_1"])
    Wg = p["Dense_3"]["kernel"]
    z = mm(current, Wg[:C]) + mm(attended, Wg[C:]) + p["Dense_3"]["bias"]
    gate = jax.nn.sigmoid(z * ag + cg)
    fused = gate * current + (1.0 - gate) * attended

    ao, co = _fold_bn(p["BatchNorm_2"], s["BatchNorm_2"])
    return jnp.maximum(
        (mm(fused, p["Dense_4"]["kernel"]) + p["Dense_4"]["bias"]) * ao + co, 0.0
    )


def _fast_sa_stage(sa_p, sa_s, xyz, features, cfg: PointNet2Config, k: int, dt,
                   new_xyz=None):
    """One SetAbstractionMSG stage through the fused scale kernel (or the XLA
    GroupAll when npoint is None). Returns (new_xyz | None, features).
    ``new_xyz`` may be precomputed by the caller (FPS prefix, see
    _fps_prefix_centroids); when None the stage runs its own FPS + gather."""
    npoint = cfg.npoints[k]
    scale_outputs = []

    if npoint is None:
        # GroupAll (reference: pointnet2_utils.py:301-328): plain SharedMLP
        # over all points + global max — already fusion-friendly in XLA.
        grouped = (
            jnp.concatenate([xyz, features], axis=-1)
            if (features is not None and cfg.use_xyz)
            else (features if features is not None else xyz)
        )
        for s in range(len(cfg.mlps[k])):
            mlp_p = sa_p[f"SharedMLP_{s}"]
            mlp_s = sa_s[f"SharedMLP_{s}"]
            h = grouped
            for li in range(len(cfg.mlps[k][s])):
                kern = mlp_p[f"Dense_{li}"]["kernel"]
                # module parity: the GroupAll branch's SharedMLP is created
                # WITHOUT a compute dtype (models/pointnet2.py GroupAll), so
                # it stays f32 even in bf16 configs — match it exactly
                z = h.astype(jnp.float32) @ kern
                a, c = _fold_bn(mlp_p[f"BatchNorm_{li}"], mlp_s[f"BatchNorm_{li}"])
                h = jnp.maximum(z * a + c, 0.0)
            scale_outputs.append(jnp.max(h, axis=1, keepdims=True))
        return None, jnp.concatenate(scale_outputs, axis=-1)

    if new_xyz is None:
        idx = furthest_point_sample(xyz, npoint)
        new_xyz = gather_points(xyz, idx)
    inp = (
        jnp.concatenate([xyz, features], axis=-1)
        if (features is not None and cfg.use_xyz)
        else (features if features is not None else xyz)
    )

    # Dense-input stages (N >= 1024: tiny radii, hit counts far below
    # nsample) use the fused kernel's dynamic slot-chunk skip, with centroids
    # ORDERED by in-radius hit count (largest stage radius) so each TM-row
    # kernel tile has homogeneous counts and whole chunks skip per tile.
    # Pure performance permutation: every centroid's output is independent of
    # centroid order, and the ORIGINAL new_xyz feeds the next stage (FPS
    # order semantics preserved). Later stages measured FASTER without any
    # skip machinery (hit counts ~nsample, the skip never fires), and
    # skip-without-sort measured slower end-to-end than both. Measured
    # (B=128 steady-state encoder): HEAD 15.45 ms, skip-everywhere 17.7-18.3,
    # stage0 skip+sort 15.08, stage0 skip unsorted 16.46.
    use_skip = xyz.shape[1] >= 1024
    if use_skip:
        cnt = ball_count(xyz, new_xyz, max(r for r in cfg.radii[k] if r is not None))
        order = jnp.argsort(-cnt, axis=1)
        inv_order = jnp.argsort(order, axis=1)
        nxs = jnp.take_along_axis(new_xyz, order[..., None], axis=1)
    else:
        nxs = new_xyz

    # all scales of the stage run in ONE kernel launch (shared distance
    # matrix, in-VMEM concat — ops/fused_sa.py:fused_sa_stage)
    projs, centers, affines_list, weights_list = [], [], [], []
    for s in range(len(cfg.radii[k])):
        kern = sa_p[f"proj_kernel_{s}"]
        projs.append((inp @ kern).astype(dt))  # (B, N, h1)
        if cfg.use_xyz:
            centers.append((nxs @ kern[:3]).astype(jnp.float32))  # (B, npoint, h1)
        else:
            # module parity: SetAbstractionMSG only centers when use_xyz
            # (the first 3 kernel rows are feature rows otherwise)
            centers.append(jnp.zeros((nxs.shape[0], nxs.shape[1], kern.shape[1])))

        mlp_p = sa_p[f"SharedMLP_{s}"]
        mlp_s = sa_s[f"SharedMLP_{s}"]
        affines = [_fold_bn(sa_p[f"BatchNorm_{s}"], sa_s[f"BatchNorm_{s}"])]
        weights = []
        for li in range(len(cfg.mlps[k][s]) - 1):
            weights.append(mlp_p[f"Dense_{li}"]["kernel"].astype(dt))
            affines.append(_fold_bn(mlp_p[f"BatchNorm_{li}"], mlp_s[f"BatchNorm_{li}"]))
        affines_list.append(affines)
        weights_list.append(weights)
    cat = fused_sa_stage(
        xyz,
        nxs,
        projs,
        centers,
        affines_list,
        weights_list,
        tuple(cfg.radii[k]),
        tuple(cfg.nsamples[k]),
        slot_chunk=4 if use_skip else 8,
        dynamic_skip=use_skip,
    )
    if use_skip:
        cat = jnp.take_along_axis(cat, inv_order[..., None], axis=1)
    return new_xyz, cat


def _fps_prefix_centroids(xyz, cfg: PointNet2Config):
    """ONE FPS run whose pick-prefixes are every stage's centroid set.

    Greedy FPS restricted to its own first-n picks reproduces the same pick
    sequence: at step i < n the argmax of the min-distance over the full set
    is itself among the first n picks (it IS pick i), so the argmax over the
    prefix subset selects the same point, and the incremental min-distance
    updates for subset members are the identical arithmetic. Hence
    ``fps(gather(xyz, fps(xyz, n0)), n1)[:n1] == arange(n1)`` and stage k's
    centroids are ``S[:, :npoints[k]]`` of the single stage-0 run — three of
    the four sequential FPS chains (and their gathers) drop out of the
    flagship stack. (Exact up to ties in the distance argmax, which the
    stagewise form breaks in subset order; exact-duplicate points never tie
    for the argmax since their min-distance is 0.) Parity vs the stagewise
    module path: tests/test_models.py::test_fast_fus_forward_parity and
    test_fps_prefix_property.

    Returns the pick-ordered stage-0 centroid set S (B, npoints[0], 3), or
    None when the config's npoints are not a shrinking chain.
    """
    ns = [n for n in cfg.npoints if n is not None]
    if not ns or any(b > a for a, b in zip(ns, ns[1:])):
        return None
    idx = furthest_point_sample(xyz, ns[0])
    return gather_points(xyz, idx)


def fast_cls_forward(variables, pointcloud, cfg: PointNet2Config):
    """variables = {'params', 'batch_stats'} of a PointNet2ClsMSG (possibly a
    sub-tree of a larger model), pointcloud (B, N, 3+C) -> (B, 1024) f32."""
    params = variables["params"]
    stats = variables["batch_stats"]
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    xyz = pointcloud[..., :3]
    features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None

    S = _fps_prefix_centroids(xyz, cfg)
    for k in range(len(cfg.npoints)):
        xyz, features = _fast_sa_stage(
            params[f"SetAbstractionMSG_{k}"],
            stats[f"SetAbstractionMSG_{k}"],
            xyz,
            features,
            cfg,
            k,
            dt,
            new_xyz=None if (S is None or cfg.npoints[k] is None)
            else S[:, : cfg.npoints[k]],
        )

    return features.squeeze(1)


def fast_fus_forward(variables, pointcloud, cfg: PointNet2Config):
    """Eval fast path for the flagship PointNet2ClsMSGFus encoder: fused SA
    stages, the gated fusion as a pure BN-folded function (_fast_gaf), and the
    rel-PE transformer through the fused attention kernel (deterministic at
    eval; the train-time input jitter is a no-op here).

    reference: pointnet2.py:255-388 (Pointnet2ClsMSGFus).
    Parity: tests/test_models.py::test_fast_fus_forward_parity."""
    from genpose2_tpu.models.attention import TransformerBlockWithRelativePE
    from genpose2_tpu.models.layers import linear_resize_points

    params = variables["params"]
    stats = variables["batch_stats"]
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    xyz = pointcloud[..., :3]
    features = pointcloud[..., 3:]
    downsampled = features

    out_channels = [sum(m[-1] for m in stage) for stage in cfg.mlps]

    S = _fps_prefix_centroids(xyz, cfg)
    for k in range(len(cfg.npoints)):
        if k > 0:
            if downsampled.shape[1] != features.shape[1]:
                downsampled = linear_resize_points(downsampled, features.shape[1])
            name = f"GatedAttentionFusion_{k - 1}"
            features = _fast_gaf(
                params[name], stats.get(name, {}), features, downsampled, dt
            )

        new_xyz, features = _fast_sa_stage(
            params[f"SetAbstractionMSG_{k}"],
            stats[f"SetAbstractionMSG_{k}"],
            xyz,
            features,
            cfg,
            k,
            dt,
            new_xyz=None if (S is None or cfg.npoints[k] is None)
            else S[:, : cfg.npoints[k]],
        )

        name = f"TransformerBlockWithRelativePE_{k}"
        tb = params[name]
        if new_xyz is not None:
            # fused rel-PE attention kernel: the bias tile is computed on the
            # fly from new_xyz; no (B, *, M, M) tensor is materialized
            # (parity: tests/test_ops.py::TestRelPEAttention).
            # qkv/wo/FF matmuls run in the config's compute dtype with f32
            # accumulation (the f32 formulation was ~190 GFLOP/iteration at
            # the flagship shapes — the largest MXU term of the encoder);
            # residuals, LayerNorm stats and biases stay f32
            def mm(a, w):
                return jnp.dot(a.astype(dt), w.astype(dt),
                               preferred_element_type=jnp.float32)

            pe = params[f"EfficientRelativePositionalEncoding_{k}"]
            mha = tb["MultiheadAttentionWithRelativePE_0"]
            q = mm(features, mha["wq"]["kernel"]) + mha["wq"]["bias"]
            kk = mm(features, mha["wk"]["kernel"]) + mha["wk"]["bias"]
            v = mm(features, mha["wv"]["kernel"]) + mha["wv"]["bias"]
            attn = relpe_attention(
                new_xyz, q, kk, v, pe, cfg.num_heads,
                compute_dtype=cfg.compute_dtype,
            )
            attn = mm(attn, mha["wo"]["kernel"]) + mha["wo"]["bias"]
            h = fast_residual_layernorm(
                features, attn,
                tb["LayerNorm_0"]["scale"], tb["LayerNorm_0"]["bias"],
            )
            ff = jax.nn.relu(mm(h, tb["Dense_0"]["kernel"]) + tb["Dense_0"]["bias"])
            ff = mm(ff, tb["Dense_1"]["kernel"]) + tb["Dense_1"]["bias"]
            features = fast_residual_layernorm(
                h, ff, tb["LayerNorm_1"]["scale"], tb["LayerNorm_1"]["bias"]
            )
        else:
            features = TransformerBlockWithRelativePE(
                out_channels[k], cfg.num_heads, cfg.dropout
            ).apply({"params": tb}, features, None, deterministic=True)
        xyz = new_xyz

    return features.squeeze(1)
