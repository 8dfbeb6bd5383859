"""Pose energy network: same trunk as the score net, but the head output is
turned into a scalar energy; the score is the gradient of the energy w.r.t.
the pose.

reference: networks/gf_algorithms/energynet.py:32-233. The reference computes
the score with torch.autograd.grad(create_graph=True) inside forward
(:221-226); here the module only defines the ENERGY — the score is obtained
functionally with jax.grad over ``apply`` (see
genpose2_tpu.models.posenet.GFObjectPose.energy_score_fn), which composes
cleanly under vmap/scan/jit and gives the second-order gradients needed in
training for free.

Mode matrix (reference: energynet.py:40-43, configs/config.py:35-37):
- energy_mode:  'DAE' | 'L2' | 'IP' (default IP: E = <pose, s_theta>, with a
  decoupled (rot, trans) 2-vector variant for ranking)
- s_theta_mode: 'score' | 'decoder' | 'identical'
- norm_energy:  'identical' | 'std' | 'minus'
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from genpose2_tpu.models.layers import GaussianFourierProjection, MLP


class PoseEnergyNet(nn.Module):
    marginal_std_fn: Callable
    pose_dim: int = 9
    regression_head: str = "Rx_Ry_and_T"
    dino_dim: int = 0
    energy_mode: str = "IP"
    s_theta_mode: str = "score"
    norm_energy: str = "identical"

    @nn.compact
    def __call__(self, pts_feat, rgb_feat, sampled_pose, t, decoupled_rt: bool = True):
        """Returns the energy: (B, 2) when decoupled (rot, trans), else (B,).

        reference: energynet.py:151-208.
        """
        t_feat = GaussianFourierProjection(128)(t[:, 0])
        t_feat = nn.relu(nn.Dense(128)(t_feat))
        pose_feat = MLP((256, 256), final_act=True)(sampled_pose)
        total = [pts_feat, t_feat, pose_feat]
        if self.dino_dim:
            total.append(rgb_feat)
        total_feat = jnp.concatenate(total, axis=-1)
        std = self.marginal_std_fn(t)

        if self.regression_head == "RT":
            f_theta = MLP((512, self.pose_dim), zero_final=True)(total_feat)
        elif self.regression_head == "R_and_T":
            rot = MLP((256, self.pose_dim - 3), zero_final=True)(total_feat)
            trans = MLP((256, 3), zero_final=True)(total_feat)
            f_theta = jnp.concatenate([rot, trans], axis=-1)
        elif self.regression_head == "Rx_Ry_and_T":
            rot_x = MLP((256, 3), zero_final=True, name="fusion_tail_rot_x")(total_feat)
            rot_y = MLP((256, 3), zero_final=True, name="fusion_tail_rot_y")(total_feat)
            trans = MLP((256, 3), zero_final=True, name="fusion_tail_trans")(total_feat)
            f_theta = jnp.concatenate([rot_x, rot_y, trans], axis=-1)
        else:
            raise NotImplementedError(self.regression_head)

        if self.s_theta_mode == "score":
            s_theta = f_theta / std
        elif self.s_theta_mode == "decoder":
            s_theta = sampled_pose - std * f_theta
        elif self.s_theta_mode == "identical":
            s_theta = f_theta
        else:
            raise NotImplementedError(self.s_theta_mode)

        if self.energy_mode == "DAE":
            energy = -0.5 * jnp.sum((sampled_pose - s_theta) ** 2, axis=-1)
        elif self.energy_mode == "L2":
            energy = -0.5 * jnp.sum(s_theta**2, axis=-1)
        elif self.energy_mode == "IP":
            if decoupled_rt:
                e_rot = jnp.sum(sampled_pose[:, :-3] * s_theta[:, :-3], axis=-1)
                e_trans = jnp.sum(sampled_pose[:, -3:] * s_theta[:, -3:], axis=-1)
                energy = jnp.stack([e_rot, e_trans], axis=-1)
            else:
                energy = jnp.sum(sampled_pose * s_theta, axis=-1)
        else:
            raise NotImplementedError(self.energy_mode)

        if self.norm_energy == "identical":
            pass
        elif self.norm_energy == "std":
            denom = std[:, 0] if energy.ndim == 1 else std  # matches (B,) or (B, 2)
            energy = energy / (denom + 1e-7)
        elif self.norm_energy == "minus":
            energy = -energy
        else:
            raise NotImplementedError(self.norm_energy)
        return energy
