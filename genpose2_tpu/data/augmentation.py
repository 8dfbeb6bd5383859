"""NOCS-style on-device point-cloud augmentation.

reference: utils/data_augmentation.py:38-364 (from FS-Net/GPV-Pose lineage;
active only for NOCS-style batches, datasets_omni6dpose.py:687-702). The four
augmentations, each gated per-sample by a probability flag:

- bounding-box anisotropic rescale in the object frame (symmetric objects get
  a shared xz factor) — defor_3D_bb_in_batch (:71-84);
- rigid RT jitter: world-frame translation offset + rotation applied to the
  cloud, GT pose updated accordingly — defor_3D_rt_in_batch (:204-211);
- box-cage y-linear xz rescale (mug/bowl classes) — defor_3D_bc_in_batch
  (:115-144);
- radial point jitter away from the GT center — defor_3D_pc (:153-160).

All vectorized jnp under jit (the reference already ran these on GPU).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from genpose2_tpu.so3.rotations import euler_zyx_to_matrix


def defor_3d_bb(pc, model_point, R, t, s, sym, aug_bb):
    """Anisotropic object-frame rescale. pc (B,N,3); s (B,3) full sizes;
    sym (B,4) (sym[:,0]==1 -> shared xz factor); aug_bb (B,3) scale factors."""
    pc_obj = jnp.einsum("bji,bnj->bni", R, pc - t[:, None, :])
    sym_aug = (aug_bb + aug_bb[:, [2, 1, 0]]) / 2.0
    factors = jnp.where((sym[:, 0] == 1)[:, None], sym_aug, aug_bb)
    pc_obj = pc_obj * factors[:, None, :]
    model_new = model_point * factors[:, None, :]
    pc_new = jnp.einsum("bij,bnj->bni", R, pc_obj) + t[:, None, :]
    return pc_new, s * factors, model_new


def defor_3d_rt(pc, R, t, aug_rt_t, aug_rt_r):
    """Rigid jitter: translate by aug_rt_t then rotate everything by aug_rt_r."""
    pc_new = pc + aug_rt_t[:, None, :]
    t_new = t + aug_rt_t
    pc_new = jnp.einsum("bij,bnj->bni", aug_rt_r, pc_new)
    R_new = jnp.einsum("bij,bjk->bik", aug_rt_r, R)
    t_new = jnp.einsum("bij,bj->bi", aug_rt_r, t_new)
    return pc_new, R_new, t_new


def defor_3d_bc(key, pc, R, t, s, model_point, nocs_scale):
    """Box-cage: xz scale varies linearly along y between ey_down and ey_up
    (both U[0.8, 1.2]); sizes recomputed from the deformed model points."""
    B = pc.shape[0]
    k1, k2 = jax.random.split(key)
    ey_up = jax.random.uniform(k1, (B, 1), minval=0.8, maxval=1.2)
    ey_down = jax.random.uniform(k2, (B, 1), minval=0.8, maxval=1.2)
    pc_obj = jnp.einsum("bji,bnj->bni", R, pc - t[:, None, :])
    s_y = s[:, 1:2]
    resize = (pc_obj[..., 1] + s_y / 2.0) / s_y * (ey_up - ey_down) + ey_down
    pc_obj = pc_obj.at[..., 0].multiply(resize).at[..., 2].multiply(resize)
    pc_new = jnp.einsum("bij,bnj->bni", R, pc_obj) + t[:, None, :]

    mp_resize = (model_point[..., 1] + s_y / 2.0) / s_y * (ey_up - ey_down) + ey_down
    mp = model_point.at[..., 0].multiply(mp_resize).at[..., 2].multiply(mp_resize)
    s_new = (jnp.max(mp, axis=1) - jnp.min(mp, axis=1)) * nocs_scale[:, None]
    return pc_new, s_new


def defor_3d_pc(key, pc, gt_t, r=0.2):
    """Radial jitter: pc += U[0, r) * (pc - center)."""
    defor = jax.random.uniform(key, pc.shape) * r
    return pc + defor * (pc - gt_t[:, None, :])


def random_rt_params(key, batch: int, t_std: float = 0.02, r_deg: float = 15.0):
    """Draw the rigid-jitter parameters (the reference draws them in the
    dataset worker; here they are explicit for on-device use)."""
    kt, kr = jax.random.split(key)
    aug_t = jax.random.normal(kt, (batch, 3)) * t_std
    angles = jax.random.uniform(kr, (batch, 3), minval=-1.0, maxval=1.0) * jnp.radians(
        r_deg
    )
    aug_R = euler_zyx_to_matrix(angles)
    return aug_t, aug_R


def data_augment(
    key,
    params: dict,
    pc,
    gt_R,
    gt_t,
    gt_s,
    sym,
    model_point: Optional[jnp.ndarray] = None,
    nocs_scale: Optional[jnp.ndarray] = None,
    mug_bowl_mask: Optional[jnp.ndarray] = None,
):
    """Apply the full augmentation stack with per-sample probability gates
    (reference: data_augmentation.py:321-346). gt_s are FULL sizes (the
    reference's mean_shape offset is folded by the caller). Returns
    (pc, gt_R, gt_t, gt_s)."""
    B = pc.shape[0]
    keys = jax.random.split(key, 8)
    if model_point is None:
        model_point = jnp.zeros_like(pc[:, : pc.shape[1]])
    if nocs_scale is None:
        nocs_scale = jnp.ones((B,))

    # bb rescale
    flag = jax.random.uniform(keys[0], (B, 1)) < params["aug_bb_pro"]
    aug_bb = jax.random.uniform(keys[1], (B, 3), minval=0.8, maxval=1.2)
    pc_new, s_new, model_new = defor_3d_bb(pc, model_point, gt_R, gt_t, gt_s, sym, aug_bb)
    pc = jnp.where(flag[..., None], pc_new, pc)
    gt_s = jnp.where(flag, s_new, gt_s)
    model_point = jnp.where(flag[..., None], model_new, model_point)

    # rigid jitter
    flag = jax.random.uniform(keys[2], (B, 1)) < params["aug_rt_pro"]
    aug_t, aug_R = random_rt_params(keys[3], B)
    pc_new, R_new, t_new = defor_3d_rt(pc, gt_R, gt_t, aug_t, aug_R)
    pc = jnp.where(flag[..., None], pc_new, pc)
    gt_R = jnp.where(flag[..., None], R_new, gt_R)
    gt_t = jnp.where(flag, t_new, gt_t)

    # box-cage (mug/bowl only)
    flag = jax.random.uniform(keys[4], (B, 1)) < params["aug_bc_pro"]
    if mug_bowl_mask is not None:
        flag = flag & mug_bowl_mask[:, None]
        pc_new, s_new = defor_3d_bc(keys[5], pc, gt_R, gt_t, gt_s, model_point, nocs_scale)
        pc = jnp.where(flag[..., None], pc_new, pc)
        gt_s = jnp.where(flag, s_new, gt_s)

    # radial jitter
    flag = jax.random.uniform(keys[6], (B, 1)) < params["aug_pc_pro"]
    pc_new = defor_3d_pc(keys[7], pc, gt_t, params["aug_pc_r"])
    pc = jnp.where(flag[..., None], pc_new, pc)

    return pc, gt_R, gt_t, gt_s
