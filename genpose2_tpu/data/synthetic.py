"""Synthetic pose data: primitive shapes with known poses.

Serves the role of the reference's demo/debug data paths for end-to-end tests
and benchmarks (no counterpart file; the reference's closest analog is the
random-tensor smoke test in networks/pts_encoder/pointnet2.py:604-639).
Batches are produced in exactly the format of the real data pipeline's
``process_batch`` output (reference: datasets/datasets_omni6dpose.py:674-754):
zero-centered clouds, zero-mean GT pose in the 9D [col0, col1, trans]
representation, the subtracted center, symmetry labels and bbox side lengths.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from genpose2_tpu.so3.rotations import matrix_to_rot6d_cols, quaternion_to_matrix
from genpose2_tpu.eval.metrics import sym_label


def _random_rotation(key, batch_shape=()):
    q = jax.random.normal(key, batch_shape + (4,))
    return quaternion_to_matrix(q)


def _box_cloud(key, n, size):
    """Points on the surface of a box with side lengths ``size`` (3,)."""
    kf, ku, ks = jax.random.split(key, 3)
    face = jax.random.randint(kf, (n,), 0, 6)
    uv = jax.random.uniform(ku, (n, 2)) - 0.5
    axis = face // 2
    sign = jnp.where(face % 2 == 0, 0.5, -0.5)
    pts = jnp.zeros((n, 3))
    other = jnp.stack([(axis + 1) % 3, (axis + 2) % 3], axis=-1)
    pts = pts.at[jnp.arange(n), axis].set(sign)
    pts = pts.at[jnp.arange(n), other[:, 0]].set(uv[:, 0])
    pts = pts.at[jnp.arange(n), other[:, 1]].set(uv[:, 1])
    return pts * size


def _cylinder_cloud(key, n, size):
    """Lateral surface + caps of a y-axis cylinder (continuous y symmetry)."""
    kt, ky, kc = jax.random.split(key, 3)
    theta = jax.random.uniform(kt, (n,)) * 2 * jnp.pi
    y = (jax.random.uniform(ky, (n,)) - 0.5) * size[1]
    r = size[0] / 2
    pts = jnp.stack([r * jnp.cos(theta), y, r * jnp.sin(theta)], axis=-1)
    return pts


class SyntheticPoseData:
    """Deterministic synthetic scene generator.

    mode='single' uses one fixed shape+pose per object index (learnable target
    for e2e tests); mode='random' draws fresh shapes and poses per batch."""

    def __init__(
        self,
        num_points: int = 1024,
        shape: str = "box",
        noise: float = 0.002,
        seed: int = 0,
    ):
        self.num_points = num_points
        self.shape = shape
        self.noise = noise
        self.seed = seed

    @functools.partial(
        jax.jit, static_argnums=(0, 2, 3), static_argnames=("batch_size", "fixed_pose")
    )
    def batch(self, key: jax.Array, batch_size: int, fixed_pose: bool = False):
        kshape, kpose, ktrans, knoise, kctr = jax.random.split(key, 5)
        if fixed_pose:
            kpose = jax.random.PRNGKey(self.seed)
            ktrans = jax.random.PRNGKey(self.seed + 1)
        B, N = batch_size, self.num_points

        size = jnp.tile(jnp.asarray([0.12, 0.2, 0.08]), (B, 1))
        R = _random_rotation(kpose, (B,))
        t = jax.random.uniform(ktrans, (B, 3), minval=-0.15, maxval=0.15) + jnp.asarray(
            [0.0, 0.0, 0.6]
        )
        if fixed_pose:
            R = jnp.tile(R[0:1], (B, 1, 1))
            t = jnp.tile(t[0:1], (B, 1))

        keys = jax.random.split(kshape, B)
        if self.shape == "box":
            clouds = jax.vmap(lambda k, s: _box_cloud(k, N, s))(keys, size)
            # a rectangular box is invariant under 180-deg flips about each
            # axis (the 4-element dihedral group): half/half/half
            sym = jnp.tile(sym_label(x="half", y="half", z="half")[None], (B, 1))
        elif self.shape == "cylinder":
            clouds = jax.vmap(lambda k, s: _cylinder_cloud(k, N, s))(keys, size)
            # continuous about y, plus the end-over-end flip
            sym = jnp.tile(sym_label(x="half", y="any")[None], (B, 1))
        else:
            raise NotImplementedError(self.shape)

        cam = jnp.einsum("bij,bnj->bni", R, clouds) + t[:, None, :]
        cam = cam + jax.random.normal(knoise, cam.shape) * self.noise

        center = jnp.mean(cam, axis=1)  # (B, 3)
        zero_pts = cam - center[:, None, :]
        zero_t = t - center
        gt_pose = jnp.concatenate([matrix_to_rot6d_cols(R), zero_t], axis=-1)

        return {
            "pts": zero_pts,
            "zero_mean_gt_pose": gt_pose,
            "pts_center": center,
            "gt_rotation": R,
            "gt_translation": t,
            "bbox_side_len": size,
            "sym_info": sym,
            "class_label": jnp.zeros((B,), jnp.int32),
            "cam_pts": cam,
        }
