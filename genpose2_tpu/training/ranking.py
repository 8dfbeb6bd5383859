"""Energy-ranking utilities for EnergyNet training and candidate aggregation.

reference: networks/reward.py:63-155. The reference's O(K^2) Python pair loop
(reward.py:118-128) is a single broadcasted upper-triangle reduction here, and
``sort_poses_by_energy`` avoids the host round-trip index gymnastics
(reward.py:145-153) with take_along_axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def sort_results(energy: jnp.ndarray, metrics: jnp.ndarray) -> jnp.ndarray:
    """Reorder energies so that index 0 is the candidate with the LOWEST error:
    rotation energies sorted by rotation error, translation energies by
    translation error (reference: reward.py:63-83).

    energy, metrics: (B, K, 2) -> (B, K, 2)."""
    rot_order = jnp.argsort(metrics[..., 0], axis=1)
    trans_order = jnp.argsort(metrics[..., 1], axis=1)
    e_rot = jnp.take_along_axis(energy[..., 0], rot_order, axis=1)
    e_trans = jnp.take_along_axis(energy[..., 1], trans_order, axis=1)
    return jnp.stack([e_rot, e_trans], axis=-1)


def ranking_loss(energy: jnp.ndarray) -> jnp.ndarray:
    """Pairwise normalized-margin ranking loss over candidates sorted
    best-first: for every pair i < j the penalty is
    1 + (E_j - E_i) / (|E_i - E_j| + 1e-5) — zero when E_i > E_j (better
    candidate has higher energy), 2 when inverted
    (reference: reward.py:109-128).

    energy (B, K, 2) -> scalar."""
    K = energy.shape[1]
    Ei = energy[:, :, None, :]  # candidate i
    Ej = energy[:, None, :, :]  # candidate j
    diff = 1.0 + (Ej - Ei) / (jnp.abs(Ei - Ej) + 1e-5)
    iu, ju = jnp.triu_indices(K, k=1)
    pair_terms = diff[:, iu, ju, :]  # (B, P, 2)
    # the reference averages each pair term over (batch, 2) then over pairs —
    # identical to a flat mean
    return jnp.mean(pair_terms)


def sort_poses_by_energy(poses: jnp.ndarray, energy: jnp.ndarray):
    """Sort candidates from highest to lowest energy, decoupled: the rotation
    part follows the rotation-energy order, the translation part the
    translation-energy order (reference: reward.py:131-155).

    poses (B, K, D), energy (B, K, 2) -> (sorted_poses, sorted_energy)."""
    order = jnp.argsort(-energy, axis=1)  # descending, (B, K, 2)
    sorted_energy = jnp.take_along_axis(energy, order, axis=1)
    rot = jnp.take_along_axis(poses, order[..., 0:1].repeat(poses.shape[-1], -1), axis=1)
    trans = jnp.take_along_axis(
        poses[..., -3:], order[..., 1:2].repeat(3, -1), axis=1
    )
    sorted_poses = jnp.concatenate([rot[..., :-3], trans], axis=-1)
    return sorted_poses, sorted_energy
