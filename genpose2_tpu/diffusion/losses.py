"""Denoising score-matching losses.

reference: networks/gf_algorithms/losses.py:8-97. The reference's training loop
repeats the loss `repeat_num`=20 times in a Python loop and averages
(reference: networks/posenet_agent.py:205-226); here the repeat axis is a vmap
over independent noise draws inside one jit — one fused kernel instead of 20
sequential graph launches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from genpose2_tpu.diffusion.sde import SDE


def dsm_loss(
    key: jax.Array,
    score_fn,
    gt_pose: jnp.ndarray,
    sde: SDE,
    repeat: int = 1,
    teacher_score_fn=None,
):
    """Weighted DSM loss.

    score_fn(x, t) -> score with x (B, D), t (B, 1). gt_pose (B, D) is the
    zero-centered ground-truth pose. With ``repeat`` > 1 the loss is averaged
    over ``repeat`` independent (t, z) draws via vmap.

    target = -z/std, weight = std^2, loss = mean_b sum_d weight*(s - target)^2
    (reference: losses.py:48-97). With a teacher, the target is the teacher's
    score on the same perturbed pose (distillation, reference: losses.py:81-86).
    """
    B, D = gt_pose.shape
    eps = sde.eps

    def single(k):
        kt, kz = jax.random.split(k)
        random_t = jax.random.uniform(kt, (B, 1), gt_pose.dtype, eps, 1.0)
        _, std = sde.marginal_prob(gt_pose, random_t)
        std = jnp.broadcast_to(jnp.asarray(std), (B, 1))
        z = jax.random.normal(kz, gt_pose.shape, gt_pose.dtype)
        mean, _ = sde.marginal_prob(gt_pose, random_t)
        perturbed = mean + z * std
        est = score_fn(perturbed, random_t)
        if teacher_score_fn is None:
            target = -z / std
        else:
            target = teacher_score_fn(perturbed, random_t)
        w = std**2
        return jnp.mean(jnp.sum(w * (est - target) ** 2, axis=-1))

    if repeat == 1:
        return single(key)
    keys = jax.random.split(key, repeat)
    return jnp.mean(jax.vmap(single)(keys))


def edm_loss(
    key: jax.Array,
    denoiser_fn,
    gt_pose: jnp.ndarray,
    sigma_min: float = 0.002,
    sigma_max: float = 80.0,
    repeat: int = 1,
):
    """EDM denoiser loss with log-uniform sigma sampling.

    ``denoiser_fn(x, sigma (B,1)) -> denoised x`` (the PoseDecoderNet
    contract, reference: scorenet.py:278-424 returns c_skip*x + c_out*F).
    The loss is ||(D(y + sigma z, sigma) - y) / sigma||^2 — algebraically the
    reference's (output*sigma + z)^2 form (losses.py:8-45) with output the
    score-form prediction (D(x) - x)/sigma^2, since
    (D - x)/sigma + z = (D - y)/sigma. Log-sigma is sampled uniformly in
    [log sigma_min, log sigma_max] exactly as the reference does (NOT the EDM
    paper's log-normal; losses.py:28-31).
    """

    def single(k):
        kz, ks = jax.random.split(k)
        B = gt_pose.shape[0]
        z = jax.random.normal(kz, gt_pose.shape, gt_pose.dtype)
        u = jax.random.uniform(ks, (B, 1), gt_pose.dtype)
        sigma_t = jnp.exp(
            jnp.log(sigma_min) + u * (jnp.log(sigma_max) - jnp.log(sigma_min))
        )
        perturbed = gt_pose + z * sigma_t
        denoised = denoiser_fn(perturbed, sigma_t)
        return jnp.mean(jnp.sum(((denoised - gt_pose) / sigma_t) ** 2, axis=-1))

    if repeat == 1:
        return single(key)
    keys = jax.random.split(key, repeat)
    return jnp.mean(jax.vmap(single)(keys))
