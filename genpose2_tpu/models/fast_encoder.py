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

import jax.numpy as jnp

from genpose2_tpu.config import PointNet2Config
from genpose2_tpu.ops import furthest_point_sample, gather_points
from genpose2_tpu.ops.fused_sa import fused_sa_scale

_BN_EPS = 1e-5


def _fold_bn(bn_params, bn_stats):
    """Eval-mode BatchNorm -> (a, c) with y = a*x + c."""
    a = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + _BN_EPS)
    c = bn_params["bias"] - bn_stats["mean"] * a
    return a, c


def fast_cls_forward(variables, pointcloud, cfg: PointNet2Config):
    """variables = {'params', 'batch_stats'} of a PointNet2ClsMSG (possibly a
    sub-tree of a larger model), pointcloud (B, N, 3+C) -> (B, 1024) f32."""
    params = variables["params"]
    stats = variables["batch_stats"]
    dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    xyz = pointcloud[..., :3]
    features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None

    for k, npoint in enumerate(cfg.npoints):
        sa_p = params[f"SetAbstractionMSG_{k}"]
        sa_s = stats[f"SetAbstractionMSG_{k}"]
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
                    z = (h.astype(dt) @ kern.astype(dt)).astype(jnp.float32)
                    a, c = _fold_bn(mlp_p[f"BatchNorm_{li}"], mlp_s[f"BatchNorm_{li}"])
                    h = jnp.maximum(z * a + c, 0.0)
                scale_outputs.append(jnp.max(h, axis=1, keepdims=True))
            features = jnp.concatenate(scale_outputs, axis=-1)
            continue

        idx = furthest_point_sample(xyz, npoint)
        new_xyz = gather_points(xyz, idx)
        inp = (
            jnp.concatenate([xyz, features], axis=-1)
            if (features is not None and cfg.use_xyz)
            else (features if features is not None else xyz)
        )
        for s, (radius, ns) in enumerate(zip(cfg.radii[k], cfg.nsamples[k])):
            kern = sa_p[f"proj_kernel_{s}"]
            proj = inp @ kern  # (B, N, h1)
            center = new_xyz @ kern[:3]  # (B, npoint, h1)

            mlp_p = sa_p[f"SharedMLP_{s}"]
            mlp_s = sa_s[f"SharedMLP_{s}"]
            affines = [_fold_bn(sa_p[f"BatchNorm_{s}"], sa_s[f"BatchNorm_{s}"])]
            weights = []
            for li in range(len(cfg.mlps[k][s]) - 1):
                weights.append(mlp_p[f"Dense_{li}"]["kernel"].astype(dt))
                affines.append(
                    _fold_bn(mlp_p[f"BatchNorm_{li}"], mlp_s[f"BatchNorm_{li}"])
                )
            out = fused_sa_scale(
                xyz,
                new_xyz,
                proj.astype(dt),
                center.astype(jnp.float32),
                affines,
                weights,
                radius,
                ns,
            )
            scale_outputs.append(out)
        features = jnp.concatenate(scale_outputs, axis=-1)
        xyz = new_xyz

    return features.squeeze(1)
