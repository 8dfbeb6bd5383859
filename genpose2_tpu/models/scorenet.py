"""Conditional pose score network s_theta(pose, t | features).

reference: networks/gf_algorithms/scorenet.py:109-275. Heads:
- 'RT'          one fused MLP -> pose_dim
- 'R_and_T'     separate rotation / translation MLPs
- 'Rx_Ry_and_T' (default) three MLPs for rot-x axis, rot-y axis, translation
All output layers are zero-initialized (reference: scorenet.py:15-21) so the
untrained score is exactly 0 and the initial reverse process is the prior.
The raw head output is divided by the marginal std (reference: :250-264).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from genpose2_tpu.models.layers import GaussianFourierProjection, MLP


class PoseScoreNet(nn.Module):
    marginal_std_fn: Callable  # t -> std (the SDE's marginal std)
    pose_dim: int = 9
    regression_head: str = "Rx_Ry_and_T"
    dino_dim: int = 0  # >0 only for dino='global' (dim 384 + embedding 60)

    @nn.compact
    def __call__(self, pts_feat, rgb_feat, sampled_pose, t):
        """pts_feat (B, 1024), rgb_feat (B, dino_dim) | None,
        sampled_pose (B, pose_dim), t (B, 1) -> score (B, pose_dim)."""
        t_feat = GaussianFourierProjection(128)(t[:, 0])
        t_feat = nn.relu(nn.Dense(128)(t_feat))
        pose_feat = MLP((256, 256), final_act=True)(sampled_pose)

        total = [pts_feat, t_feat, pose_feat]
        if self.dino_dim:
            total.append(rgb_feat)
        total_feat = jnp.concatenate(total, axis=-1)

        std = self.marginal_std_fn(t)  # (B, 1), broadcasts over pose_dim

        if self.regression_head == "RT":
            out = MLP((512, self.pose_dim), zero_final=True)(total_feat)
        elif self.regression_head == "R_and_T":
            rot = MLP((256, self.pose_dim - 3), zero_final=True)(total_feat)
            trans = MLP((256, 3), zero_final=True)(total_feat)
            out = jnp.concatenate([rot, trans], axis=-1)
        elif self.regression_head == "Rx_Ry_and_T":
            rot_x = MLP((256, 3), zero_final=True, name="fusion_tail_rot_x")(total_feat)
            rot_y = MLP((256, 3), zero_final=True, name="fusion_tail_rot_y")(total_feat)
            trans = MLP((256, 3), zero_final=True, name="fusion_tail_trans")(total_feat)
            out = jnp.concatenate([rot_x, rot_y, trans], axis=-1)
        else:
            raise NotImplementedError(self.regression_head)
        return out / (std + 1e-7)


class PoseDecoderNet(nn.Module):
    """EDM-preconditioned denoiser head (reference: scorenet.py:278-424, VE
    branch of the preconditioning: c_skip=1, c_out=sigma, c_in=1,
    c_noise=log(sigma/2)). Unused by the default 've' pipeline but kept for
    the 'edm' sde mode."""

    marginal_std_fn: Callable
    pose_dim: int = 9
    regression_head: str = "Rx_Ry_and_T"

    @nn.compact
    def __call__(self, pts_feat, rgb_feat, sampled_pose, t):
        sigma_t = self.marginal_std_fn(t)
        c_skip, c_out, c_in = 1.0, sigma_t, 1.0
        c_noise = jnp.log(sigma_t / 2.0)

        pose_feat = MLP((256, 256), final_act=True)(sampled_pose * c_in)
        # positional embedding of c_noise (reference: scorenet.py:91-106)
        num_ch = 128
        freqs = jnp.arange(num_ch // 2, dtype=jnp.float32) / (num_ch // 2)
        freqs = (1.0 / 10000.0) ** freqs
        emb = c_noise[:, 0:1] * freqs[None, :]
        sig_feat = jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)
        sig_feat = nn.relu(nn.Dense(128)(sig_feat))

        total_feat = jnp.concatenate([pts_feat, sig_feat, pose_feat], axis=-1)
        if self.regression_head == "RT":
            out = MLP((512, self.pose_dim), zero_final=True)(total_feat)
        elif self.regression_head == "Rx_Ry_and_T":
            rot_x = MLP((256, 3), zero_final=True)(total_feat)
            rot_y = MLP((256, 3), zero_final=True)(total_feat)
            trans = MLP((256, 3), zero_final=True)(total_feat)
            out = jnp.concatenate([rot_x, rot_y, trans], axis=-1)
        else:
            raise NotImplementedError(self.regression_head)
        return c_skip * sampled_pose + c_out * out
