"""Candidate aggregation: energy ranking -> retain -> cluster -> average.

reference: runners/evaluation_single.py:160-219. Fully on-device: the
reference's sklearn DBSCAN host callback per object (:199-209) is replaced by
a fixed-iteration connected-components pass over the K'xK' adjacency — K' is
20 with the default eval config, so the whole clustering is a handful of
tiny VPU ops under the same jit as the ranking.

DBSCAN semantics faithfully reproduced, including a subtle reference quirk:
sklearn's ``DBSCAN.fit(pairwise_distance)`` treats each ROW of the quaternion
distance matrix as a EUCLIDEAN FEATURE VECTOR (the reference does not pass
``metric='precomputed'``), so two candidates are neighbors when the L2 norm
between their distance-matrix ROWS is <= eps — not when their quaternion
distance is <= eps. We reproduce the row-space metric exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from genpose2_tpu.so3.rotations import (
    average_quaternion_batch_fast as average_quaternion_batch,
    get_rot_matrix,
    matrix_to_quaternion,
    quaternion_to_matrix,
)
from genpose2_tpu.training.ranking import sort_poses_by_energy


def _dbscan_largest_cluster(row_dist: jnp.ndarray, eps: float, min_samples: int):
    """DBSCAN over points whose pairwise euclidean distances are given by
    ``row_dist`` (K, K); returns (mask of the largest cluster (K,), found flag).

    sklearn semantics: neighborhoods use <= eps and include the point itself;
    core points have >= min_samples neighbors; clusters are connected
    components of core points plus their border points."""
    K = row_dist.shape[0]
    adj = row_dist <= eps  # includes self (diag 0)
    degree = jnp.sum(adj, axis=1)
    core = degree >= min_samples  # (K,)

    # connected components among core points via min-label propagation
    core_adj = adj & core[:, None] & core[None, :]
    labels = jnp.where(core, jnp.arange(K), K)  # non-core start as K (no label)

    def prop(labels, _):
        # label_i <- min over core-neighbors j of label_j (and itself)
        neigh = jnp.where(core_adj, labels[None, :], K)
        new = jnp.minimum(labels, jnp.min(neigh, axis=1))
        new = jnp.where(core, new, K)
        return new, None

    labels, _ = jax.lax.scan(prop, labels, None, length=K)

    # border points: attach to the minimum core-neighbor label
    border_neigh = jnp.where(adj & core[None, :], labels[None, :], K)
    border_label = jnp.min(border_neigh, axis=1)
    final = jnp.where(core, labels, border_label)  # K = noise

    # largest cluster by membership count (noise bucket K excluded)
    counts = jnp.sum(
        (final[:, None] == jnp.arange(K)[None, :]) & (final[:, None] < K), axis=0
    )
    best = jnp.argmax(counts)
    found = counts[best] > 0
    mask = (final == best) & found
    return mask, found


@functools.partial(
    jax.jit, static_argnames=("retain_ratio", "clustering", "eps", "minpts_ratio", "pose_mode")
)
def aggregate_candidates(
    poses: jnp.ndarray,
    energies: Optional[jnp.ndarray] = None,
    retain_ratio: float = 0.4,
    clustering: bool = True,
    eps: float = 0.05,
    minpts_ratio: float = 0.1667,
    pose_mode: str = "rot_matrix",
):
    """poses (B, K, D) camera-frame candidates, energies (B, K, 2) (uniform
    when None, i.e. score-only aggregation) ->
    dict(rotation (B,3,3), translation (B,3), quat (B,4), retained (B,K',D)).

    Pipeline (reference: evaluation_single.py:176-215): sort by energy
    (decoupled rot/trans), keep the top ``retain_ratio`` fraction, quaternion-
    average the retained rotations (clustered mode re-averages the largest
    DBSCAN cluster), arithmetic-mean the retained translations."""
    B, K, D = poses.shape
    if energies is None:
        energies = jnp.ones((B, K, 2), poses.dtype)
    sorted_poses, _ = sort_poses_by_energy(poses, energies)
    retain = max(int(K * retain_ratio), 1)
    good = sorted_poses[:, :retain]  # (B, K', D)

    R = get_rot_matrix(good[..., :-3].reshape(B * retain, -1), pose_mode)
    quat = matrix_to_quaternion(R).reshape(B, retain, 4)
    agg_quat = average_quaternion_batch(quat)

    if clustering:
        min_samples = max(int(minpts_ratio * retain), 1)
        # quaternion distance matrix rows as feature vectors (see module doc)
        qd = 1.0 - jnp.einsum("bki,bji->bkj", quat, quat) ** 2  # (B, K', K')
        row_dist = jnp.linalg.norm(qd[:, :, None, :] - qd[:, None, :, :], axis=-1)

        def per_object(rd, q, fallback):
            mask, found = _dbscan_largest_cluster(rd, eps, min_samples)
            w = mask.astype(q.dtype)
            w = w / jnp.maximum(jnp.sum(w), 1.0)
            clustered = average_quaternion_batch(q[None], w[None])[0]
            return jnp.where(found, clustered, fallback)

        agg_quat = jax.vmap(per_object)(row_dist, quat, agg_quat)

    agg_trans = jnp.mean(good[..., -3:], axis=1)
    return {
        "rotation": quaternion_to_matrix(agg_quat),
        "translation": agg_trans,
        "quat": agg_quat,
        "retained": good,
    }


def analytic_bbox_lengths(pcl: jnp.ndarray, rotation: jnp.ndarray, translation: jnp.ndarray):
    """Scale fallback without a ScaleNet: rotate the (camera-frame) cloud into
    the predicted object frame and take 2*max(|xyz|) per axis
    (reference: evaluation_single.py:233-248).

    pcl (B, N, 3), rotation (B, 3, 3), translation (B, 3) -> (B, 3)."""
    centered = pcl - translation[:, None, :]
    obj = jnp.einsum("bji,bnj->bni", rotation, centered)  # R^T @ p
    return 2.0 * jnp.max(jnp.abs(obj), axis=1)
