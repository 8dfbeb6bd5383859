"""Composition root: point encoder + image-feature fusion + score/energy head.

reference: networks/posenet.py:27-345 (GFObjectPose). Differences by design:

- The frozen ViT backbone is NOT owned by this module. It is an external
  "image feature provider" (see genpose2_tpu.models.vit) managed by the agent,
  mirroring the fact that the reference loads it from an out-of-repo torch.hub
  asset (reference: posenet.py:56-62). This module consumes the provider's
  intermediate token features.
- Sampling does not live inside the network: the agent builds pure
  ``score_fn(x, t)`` closures over ``apply`` and hands them to
  genpose2_tpu.diffusion.samplers (the reference dispatches strings through
  forward(), reference: posenet.py:294-345).
- The patch-index lookup for per-point DINO features uses the true patch size
  (``// patch_size``); the reference divides by 14 while running 16-px patches
  on 256-px crops and relies on index clamping to mask the resulting overflow
  (reference: posenet.py:149-196). Weight compatibility is not a goal, spatial
  correctness is.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from genpose2_tpu.config import ModelConfig
from genpose2_tpu.models.energynet import PoseEnergyNet
from genpose2_tpu.models.img_encoder import ImgEncoder
from genpose2_tpu.models.pointnet import PointNetFeat
from genpose2_tpu.models.pointnet2 import PointNet2ClsMSG, PointNet2ClsMSGFus
from genpose2_tpu.models.scorenet import PoseDecoderNet, PoseScoreNet
from genpose2_tpu.so3.rotations import encode_axes


class GFObjectPose(nn.Module):
    cfg: ModelConfig
    marginal_std_fn: Callable  # t (B,1) -> std (B,1)
    agent_type: str = "score"  # 'score' | 'energy'
    # sde mode 'edm': the score net is replaced by the EDM-preconditioned
    # denoiser (reference: scorenet.py:278-424 used when sde_mode='edm')
    use_decoder: bool = False

    def setup(self):
        m = self.cfg
        if m.dino != "none":
            grid = m.img_size // m.patch_size
            img_dt = (
                jnp.bfloat16 if m.pointnet2.compute_dtype == "bfloat16" else None
            )
            self.img_encoder = ImgEncoder(m.dino_dim, grid * grid, dtype=img_dt)
        if m.pts_encoder == "pointnet":
            self.pts_encoder = PointNetFeat(out_dim=1024, in_dim=3)
        elif m.pts_encoder == "pointnet2":
            if m.dino == "pointwise":
                self.pts_encoder = PointNet2ClsMSGFus(m.pointnet2)
            else:
                self.pts_encoder = PointNet2ClsMSG(m.pointnet2)
        elif m.pts_encoder == "pointnet_and_pointnet2":
            self.pts_pointnet = PointNetFeat(out_dim=1024, in_dim=3)
            self.pts_pointnet2 = PointNet2ClsMSG(m.pointnet2)
            self.fusion_layer = nn.Dense(1024)
        else:
            raise NotImplementedError(m.pts_encoder)

        score_dino_dim = (
            m.dino_dim + m.global_embedding_dim if m.dino == "global" else 0
        )
        if self.agent_type == "score":
            if self.use_decoder:
                self.pose_net = PoseDecoderNet(
                    self.marginal_std_fn, m.pose_dim, m.regression_head
                )
            else:
                self.pose_net = PoseScoreNet(
                    self.marginal_std_fn, m.pose_dim, m.regression_head, score_dino_dim
                )
        elif self.agent_type == "energy":
            self.pose_net = PoseEnergyNet(
                self.marginal_std_fn,
                m.pose_dim,
                m.regression_head,
                score_dino_dim,
                m.energy_mode,
                m.s_theta_mode,
                m.norm_energy,
            )
        else:
            raise NotImplementedError(self.agent_type)

    # ----------------------------------------------------------- rgb fusion
    def fuse_dino_layers(self, dino_layers):
        """3 intermediate ViT token tensors -> fused patch features (B, P, D).
        reference: posenet.py:138-146."""
        return self.img_encoder(dino_layers)

    def pointwise_rgb_feat(self, fused_patches, roi_xs, roi_ys):
        """Gather a per-point DINO feature for each 3D point from its 2D
        projection (reference: posenet.py:149-197, with the correct
        patch-size mapping)."""
        m = self.cfg
        grid = m.img_size // m.patch_size
        xs = roi_xs.astype(jnp.int32) // m.patch_size
        ys = roi_ys.astype(jnp.int32) // m.patch_size
        pos = jnp.clip(xs * grid + ys, 0, fused_patches.shape[1] - 1)  # (B, N)
        return jnp.take_along_axis(
            fused_patches, pos[..., None].astype(jnp.int32), axis=1
        )  # (B, N, D)

    # --------------------------------------------------------- pts features
    def extract_pts_feature(self, data, train: bool = False):
        """data: {'pts' (B,N,3), optional 'dino_layers' [3 x (B,P,D)],
        'roi_xs'/'roi_ys' (B,N)} -> (B, 1024).

        reference: posenet.py:127-228."""
        m = self.cfg
        pts = data["pts"]
        if m.dino == "pointwise":
            fused = self.fuse_dino_layers(data["dino_layers"])
            rgb_feat = self.pointwise_rgb_feat(fused, data["roi_xs"], data["roi_ys"])
            rgb_feat = jax.lax.stop_gradient(rgb_feat)
            inp = jnp.concatenate([pts, rgb_feat], axis=-1)
            return self.pts_encoder(inp, train=train)
        if m.pts_encoder == "pointnet":
            return self.pts_encoder(pts, train=train)
        if m.pts_encoder == "pointnet_and_pointnet2":
            f1 = self.pts_pointnet(pts, train=train)
            f2 = self.pts_pointnet2(pts, train=train)
            return nn.relu(self.fusion_layer(jnp.concatenate([f1, f2], axis=-1)))
        return self.pts_encoder(pts, train=train)

    def extract_global_rgb_feature(self, data):
        """dino='global': CLS-style global feature + encoded view direction.
        reference: posenet.py:316-337."""
        m = self.cfg
        assert m.dino == "global"
        global_feat = data["dino_global"]  # (B, dino_dim) from the provider
        emb = encode_axes(data["roi_center_dir"], m.global_embedding_dim // 6)
        return jnp.concatenate([global_feat, emb], axis=-1)

    # ------------------------------------------------------------- heads
    def score(self, pts_feat, rgb_feat, sampled_pose, t):
        assert self.agent_type == "score" and not self.use_decoder
        return self.pose_net(pts_feat, rgb_feat, sampled_pose, t)

    def denoise(self, pts_feat, rgb_feat, sampled_pose, sigma):
        """EDM denoiser D(x; sigma) (sde mode 'edm'; t and sigma are
        interchangeable, reference: samplers.py:283 comment)."""
        assert self.agent_type == "score" and self.use_decoder
        return self.pose_net(pts_feat, rgb_feat, sampled_pose, sigma)

    def energy(self, pts_feat, rgb_feat, sampled_pose, t, decoupled_rt: bool = True):
        assert self.agent_type == "energy"
        return self.pose_net(pts_feat, rgb_feat, sampled_pose, t, decoupled_rt)

    def __call__(self, data, train: bool = False):
        """Default entry point (used for init): pts feature + one head pass."""
        pts_feat = self.extract_pts_feature(data, train=train)
        rgb_feat = (
            self.extract_global_rgb_feature(data) if self.cfg.dino == "global" else None
        )
        if self.agent_type == "score":
            return self.pose_net(pts_feat, rgb_feat, data["sampled_pose"], data["t"])
        return self.pose_net(pts_feat, rgb_feat, data["sampled_pose"], data["t"], True)


def energy_score_fn(model: GFObjectPose, variables, pts_feat, rgb_feat):
    """Score of an energy model = grad of the (coupled) energy w.r.t. the pose
    (reference: energynet.py:211-233, torch.autograd.grad with
    create_graph=True — here a plain jax.grad that composes under jit/vmap and
    higher-order AD)."""

    def score(x, t):
        def e(p):
            out = model.apply(
                variables, pts_feat, rgb_feat, p, t, False, method=GFObjectPose.energy
            )
            return jnp.sum(out)

        return jax.grad(e)(x)

    return score
