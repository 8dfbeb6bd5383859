"""PointNet++ MSG encoders, TPU-first.

Re-design of the reference encoder stack
(reference: networks/pts_encoder/pointnet2.py, pointnet2_modules.py):

- channels-last layout; the SharedMLP 1x1 convs become Dense (MXU) ops;
- the grouped tensor (B, npoint, nsample, 3+C) is never materialized at input
  width: the first MLP layer is linear, so points are PROJECTED ONCE to the
  first hidden width (B, N, H1), gathered at H1 channels, and the centroid
  contribution (center . W_xyz) is subtracted after the gather — exactly
  equivalent to the reference's gather-then-conv, but the gather moves H1
  (16-64) channels instead of 3+C (up to 387 with pointwise DINO features);
- FPS / ball-query indices come from the deterministic ops layer
  (genpose2_tpu.ops), Pallas FPS on TPU.

Stack configuration = ClsMSG_CFG_Light (reference: pointnet2.py:77-89),
injected via PointNet2Config instead of import-time flag parsing
(the reference reads argparse at import, pointnet2.py:28).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from genpose2_tpu.config import PointNet2Config
from genpose2_tpu.models.attention import (
    EfficientRelativePositionalEncoding,
    GatedAttentionFusion,
    TransformerBlockWithRelativePE,
)
from genpose2_tpu.models.layers import SharedMLP, linear_resize_points
from genpose2_tpu.ops import ball_query, furthest_point_sample, gather_points, group_points
from genpose2_tpu.ops.grouping import group_points_matmul


def _group(features, idx):
    """TPU: one-hot MXU gather; CPU: exact take_along_axis."""
    if jax.default_backend() == "cpu":
        return group_points(features, idx)
    return group_points_matmul(features, idx)


class SetAbstractionMSG(nn.Module):
    """Multi-scale-grouping set abstraction.

    (xyz (B, N, 3), features (B, N, C) | None) ->
        (new_xyz (B, npoint, 3) | None, new_features (B, npoint, sum C_out),
         idx (B, npoint) | None)

    reference: pointnet2_modules.py:10-125 (FPS -> per-scale ball query ->
    group+center -> SharedMLP -> max-pool -> concat). npoint=None groups all
    points (GroupAll, reference: pointnet2_utils.py:301-328) and returns
    features of shape (B, 1, sum C_out).
    """

    npoint: Optional[int]
    radii: Sequence[Optional[float]]
    nsamples: Sequence[Optional[int]]
    mlps: Sequence[Sequence[int]]  # hidden widths per scale (input dim excluded)
    use_xyz: bool = True
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        B, N, _ = xyz.shape
        scale_outputs = []

        if self.npoint is not None:
            idx = furthest_point_sample(xyz, self.npoint)
            new_xyz = gather_points(xyz, idx)  # (B, npoint, 3)
            inp = (
                jnp.concatenate([xyz, features], axis=-1)
                if (features is not None and self.use_xyz)
                else (features if features is not None else xyz)
            )
            for s, (radius, ns, widths) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)
            ):
                h1 = widths[0]
                # project all points once at full width, then gather H1 channels
                kernel = self.param(
                    f"proj_kernel_{s}",
                    nn.initializers.lecun_normal(),
                    (inp.shape[-1], h1),
                )
                proj = inp @ kernel  # (B, N, h1)
                g_idx = ball_query(xyz, new_xyz, radius, ns)  # (B, npoint, ns)
                grouped = _group(proj, g_idx)  # (B, npoint, ns, h1)
                if self.use_xyz:
                    center_proj = new_xyz @ kernel[:3]  # (B, npoint, h1)
                    grouped = grouped - center_proj[:, :, None, :]
                elif features is None:
                    raise ValueError("cannot have neither features nor xyz")
                dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
                pre = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5
                )(grouped.astype(jnp.float32))
                pre = nn.relu(pre)
                out = SharedMLP(tuple(widths[1:]), dtype=dt)(pre, train=train)
                scale_outputs.append(jnp.max(out, axis=2))  # (B, npoint, C_out)
            return new_xyz, jnp.concatenate(scale_outputs, axis=-1), idx

        # GroupAll: one "centroid" covering every point
        grouped = (
            jnp.concatenate([xyz, features], axis=-1)
            if (features is not None and self.use_xyz)
            else (features if features is not None else xyz)
        )
        for widths in self.mlps:
            out = SharedMLP(tuple(widths))(grouped, train=train)  # (B, N, C_out)
            scale_outputs.append(jnp.max(out, axis=1, keepdims=True))  # (B, 1, C_out)
        return None, jnp.concatenate(scale_outputs, axis=-1), None


class FeaturePropagation(nn.Module):
    """Feature-propagation (upsampling) module for the segmentation-style
    encoder: 3-NN inverse-distance interpolation of the coarse features to the
    fine points, concat with skip features, then a SharedMLP.

    reference: pointnet2_modules.py:164-215 (PointnetFPModule). The reference's
    segmentation encoder that consumes it (Pointnet2MSG) ships with a live
    debugger breakpoint in forward (reference: pointnet2.py:202) — included
    here for capability completeness of the FP path."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats, train: bool = False):
        """unknown (B, n, 3), known (B, m, 3) | None, unknown_feats
        (B, n, C1) | None, known_feats (B, m, C2) -> (B, n, mlp[-1])."""
        from genpose2_tpu.ops import three_interpolate, three_nn

        if known is not None:
            dist, idx = three_nn(unknown, known)
            recip = 1.0 / (dist + 1e-8)
            weight = recip / jnp.sum(recip, axis=2, keepdims=True)
            interp = three_interpolate(known_feats, idx, weight)
        else:
            interp = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1], known_feats.shape[-1])
            )
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(tuple(self.mlp))(interp, train=train)


class PointNet2SegMSG(nn.Module):
    """Segmentation-style encoder: SA downsampling stack + FP upsampling stack
    + per-point classification head.

    reference: pointnet2.py:133-208 (Pointnet2MSG with MSG_CFG + FP_MLPS +
    CLS_FC; its forward ships with a live ipdb breakpoint there). Returns
    per-point logits (B, N, 1)."""

    cfg: PointNet2Config
    fp_mlps: Tuple[Tuple[int, ...], ...] = ((64, 64), (128, 128), (256, 256), (512, 512))
    cls_fc: Tuple[int, ...] = (128,)
    dropout: float = 0.5

    @nn.compact
    def __call__(self, pointcloud, train: bool = False):
        xyz = pointcloud[..., :3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None
        n_sa = len(self.fp_mlps)
        l_xyz = [xyz]
        l_feats = [features]
        for k in range(n_sa):
            new_xyz, new_feats, _ = SetAbstractionMSG(
                npoint=self.cfg.npoints[k],
                radii=self.cfg.radii[k],
                nsamples=self.cfg.nsamples[k],
                mlps=self.cfg.mlps[k],
                use_xyz=self.cfg.use_xyz,
                compute_dtype=self.cfg.compute_dtype,
            )(l_xyz[k], l_feats[k], train=train)
            l_xyz.append(new_xyz)
            l_feats.append(new_feats)
        # FP stack, coarsest -> finest (reference: pointnet2.py:203-206)
        for i in range(n_sa, 0, -1):
            l_feats[i - 1] = FeaturePropagation(self.fp_mlps[i - 1])(
                l_xyz[i - 1], l_xyz[i], l_feats[i - 1], l_feats[i], train=train
            )
        h = l_feats[0]
        for f in self.cls_fc:
            h = SharedMLP((f,))(h, train=train)
            h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return nn.Dense(1)(h)  # (B, N, 1) per-point logits


class PointNet2ClsMSG(nn.Module):
    """Plain MSG classification encoder: SA stack -> (B, 1024) global feature.

    reference: pointnet2.py:211-252 with ClsMSG_CFG_Light.
    """

    cfg: PointNet2Config

    @nn.compact
    def __call__(self, pointcloud, train: bool = False):
        xyz = pointcloud[..., :3]
        features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None
        for k in range(len(self.cfg.npoints)):
            new_xyz, features, _ = SetAbstractionMSG(
                npoint=self.cfg.npoints[k],
                radii=self.cfg.radii[k],
                nsamples=self.cfg.nsamples[k],
                mlps=self.cfg.mlps[k],
                use_xyz=self.cfg.use_xyz,
                compute_dtype=self.cfg.compute_dtype,
            )(xyz, features, train=train)
            xyz = new_xyz
        return features.squeeze(1)  # (B, C_final)


class PointNet2ClsMSGFus(nn.Module):
    """The fork's main encoder: SA stack with gated DINO-feature fusion,
    relative-PE transformer blocks per stage, and train-time input jitter.

    pointcloud (B, N, 3 + dino_dim) -> (B, 1024).
    reference: pointnet2.py:255-388. Notes:
    - the per-stage gather of surviving original features
      (reference: pointnet2.py:372-379) is dead code there (the fusion path
      uses the linearly-resized ``downsampled_original`` instead) and is not
      reproduced;
    - train-time jitter (x 1e-3) applies to the whole input including the
      DINO channels, as in the reference (:332-333).
    """

    cfg: PointNet2Config

    @nn.compact
    def __call__(self, pointcloud, train: bool = False):
        if train:
            noise = jax.random.normal(
                self.make_rng("aug"), pointcloud.shape, pointcloud.dtype
            )
            pointcloud = pointcloud + noise * self.cfg.input_jitter

        xyz = pointcloud[..., :3]
        features = pointcloud[..., 3:]
        original = features
        downsampled = original

        # per-stage output widths
        out_channels = [sum(m[-1] for m in stage) for stage in self.cfg.mlps]

        for k in range(len(self.cfg.npoints)):
            if k > 0:
                if downsampled.shape[1] != features.shape[1]:
                    downsampled = linear_resize_points(downsampled, features.shape[1])
                gaf_dt = (
                    jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else None
                )
                features = GatedAttentionFusion(out_channels[k - 1], dtype=gaf_dt)(
                    features, downsampled, train=train
                )
                features = nn.Dropout(self.cfg.dropout)(features, deterministic=not train)

            new_xyz, features, idx = SetAbstractionMSG(
                npoint=self.cfg.npoints[k],
                radii=self.cfg.radii[k],
                nsamples=self.cfg.nsamples[k],
                mlps=self.cfg.mlps[k],
                use_xyz=self.cfg.use_xyz,
                compute_dtype=self.cfg.compute_dtype,
            )(xyz, features, train=train)

            if new_xyz is not None:
                rel_bias = EfficientRelativePositionalEncoding(self.cfg.num_heads)(new_xyz)
            else:
                rel_bias = None
                features = features  # (B, 1, C): single-token sequence
            features = TransformerBlockWithRelativePE(
                out_channels[k], self.cfg.num_heads, self.cfg.dropout
            )(features, rel_bias, deterministic=not train)
            xyz = new_xyz
        return features.squeeze(1)
