"""Golden tests for the SO(3) library against independent scipy/torch formulas
and against the reference conventions (utils/misc.py, utils/transforms/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from genpose2_tpu import so3


def random_rotations(rng, n):
    return ScipyRot.random(n, random_state=rng.integers(1 << 30)).as_matrix().astype(np.float32)


class TestQuaternion:
    def test_quat_matrix_roundtrip(self, rng):
        R = random_rotations(rng, 64)
        q = so3.matrix_to_quaternion(jnp.asarray(R))
        R2 = so3.quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_quat_to_matrix_against_scipy(self, rng):
        q = rng.normal(size=(32, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        R = so3.quaternion_to_matrix(jnp.asarray(q))
        # scipy uses xyzw ordering
        R_scipy = ScipyRot.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(np.asarray(R), R_scipy, atol=1e-5)

    def test_matrix_to_quaternion_sign_consistency(self, rng):
        # q and -q map to the same matrix; roundtrip must return a valid preimage
        R = random_rotations(rng, 16)
        q = np.asarray(so3.matrix_to_quaternion(jnp.asarray(R)))
        norms = np.linalg.norm(q, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)


class TestRot6D:
    def test_roundtrip(self, rng):
        R = random_rotations(rng, 64)
        d6 = so3.matrix_to_rot6d_cols(jnp.asarray(R))
        R2 = so3.rot6d_cols_to_matrix(d6)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)

    def test_column_convention(self, rng):
        # The 9D repr stores the first two COLUMNS (reference: utils/misc.py:191)
        R = random_rotations(rng, 8)
        d6 = np.asarray(so3.matrix_to_rot6d_cols(jnp.asarray(R)))
        np.testing.assert_allclose(d6[:, :3], R[:, :, 0], atol=1e-6)
        np.testing.assert_allclose(d6[:, 3:], R[:, :, 1], atol=1e-6)

    def test_gram_schmidt_on_noisy_input(self, rng):
        d6 = rng.normal(size=(32, 6)).astype(np.float32)
        R = np.asarray(so3.rot6d_cols_to_matrix(jnp.asarray(d6)))
        # proper rotations
        RtR = np.einsum("bij,bik->bjk", R, R)
        np.testing.assert_allclose(RtR, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
        # first column is the normalized first input triple
        np.testing.assert_allclose(
            R[:, :, 0], d6[:, :3] / np.linalg.norm(d6[:, :3], axis=-1, keepdims=True), atol=1e-5
        )


class TestEuler:
    def test_roundtrip(self, rng):
        R = random_rotations(rng, 64)
        e = so3.matrix_to_euler_zyx(jnp.asarray(R))
        R2 = so3.euler_zyx_to_matrix(e)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)

    def test_against_scipy_zyx(self, rng):
        angles = rng.uniform(-1.0, 1.0, size=(16, 3)).astype(np.float32)
        R = so3.euler_zyx_to_matrix(jnp.asarray(angles))
        R_scipy = ScipyRot.from_euler("ZYX", angles).as_matrix()
        np.testing.assert_allclose(np.asarray(R), R_scipy, atol=1e-5)


class TestPoseRepr:
    @pytest.mark.parametrize("mode", ["quat_wxyz", "quat_xyzw", "rot_matrix", "euler_xyz"])
    def test_repr_roundtrip(self, rng, mode):
        R = random_rotations(rng, 32)
        rep = so3.get_pose_representation(jnp.asarray(R), mode)
        assert rep.shape[-1] == so3.get_pose_dim(mode) - 3
        R2 = so3.get_rot_matrix(rep, mode)
        np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)

    def test_normalize_rotation_is_projection(self, rng):
        noisy = rng.normal(size=(16, 6)).astype(np.float32)
        n1 = so3.normalize_rotation(jnp.asarray(noisy), "rot_matrix")
        n2 = so3.normalize_rotation(n1, "rot_matrix")
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-5)


class TestTransform:
    def test_transform_and_inverse(self, rng):
        R = random_rotations(rng, 8)
        t = rng.normal(size=(8, 3)).astype(np.float32)
        pose = np.concatenate(
            [np.asarray(so3.matrix_to_rot6d_cols(jnp.asarray(R))), t], axis=-1
        )
        pts = rng.normal(size=(8, 50, 3)).astype(np.float32)
        out = so3.transform_batch_pts(jnp.asarray(pts), jnp.asarray(pose), "rot_matrix")
        back = so3.transform_batch_pts(out, jnp.asarray(pose), "rot_matrix", inverse_pose=True)
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)
        expected = np.einsum("bij,bnj->bni", R, pts) + t[:, None, :]
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


class TestQuaternionAverage:
    def test_identical_quats(self, rng):
        q = rng.normal(size=(4, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        Q = np.tile(q[:, None, :], (1, 10, 1))
        avg = np.asarray(so3.average_quaternion_batch(jnp.asarray(Q)))
        # same rotation up to sign
        dot = np.abs(np.sum(avg * q, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-4)

    def test_small_perturbations_average_near_center(self, rng):
        base = ScipyRot.random(1, random_state=1).as_matrix()[0]
        key = jax.random.PRNGKey(0)
        Rs = so3.add_noise_to_R(key, jnp.tile(jnp.asarray(base, jnp.float32), (64, 1, 1)), 5.0)
        q = so3.matrix_to_quaternion(Rs)[None]  # (1, 64, 4)
        avg = so3.average_quaternion_batch(q)
        R_avg = np.asarray(so3.quaternion_to_matrix(avg))[0]
        ang = np.asarray(so3.rotation_angle_deg(jnp.asarray(R_avg), jnp.asarray(base)))
        assert ang < 2.5  # mean of 5-deg jitters concentrates near the center

    def test_weighted_average(self, rng):
        qa = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
        qb = np.asarray(
            so3.matrix_to_quaternion(
                jnp.asarray(ScipyRot.from_euler("z", 20, degrees=True).as_matrix(), jnp.float32)[None]
            )
        )[0]
        Q = jnp.asarray(np.stack([qa, qb])[None])
        w_a = jnp.asarray([[1.0, 0.0]])
        avg = np.asarray(so3.average_quaternion_batch(Q, w_a))[0]
        assert abs(np.abs(np.dot(avg, qa)) - 1) < 1e-5


class TestNoise:
    def test_noise_magnitude(self):
        key = jax.random.PRNGKey(42)
        R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (512, 1, 1))
        Rn = so3.add_noise_to_R(key, R, r_deg=10.0)
        ang = np.asarray(so3.rotation_angle_deg(Rn, R))
        assert ang.max() <= 20.0 + 1e-3  # truncated at 2 sigma
        assert 2.0 < np.abs(ang).mean() < 12.0

    def test_rt_noise(self):
        key = jax.random.PRNGKey(7)
        R = jnp.tile(jnp.eye(3, dtype=jnp.float32), (256, 1, 1))
        t = jnp.zeros((256, 3), jnp.float32)
        Rn, tn = so3.add_noise_to_RT(key, R, t, r_deg=5.0, t_std=0.03)
        assert np.abs(np.asarray(tn)).max() <= 0.06 + 1e-5
        assert np.asarray(so3.rotation_angle_deg(Rn, R)).max() <= 10.0 + 1e-3


class TestEncodeAxes:
    def test_shape_and_values(self):
        axes = jnp.ones((2, 3, 3), jnp.float32) * 0.5
        out = encode = so3.encode_axes(axes, dim=10)
        assert out.shape == (2, 2 * 9 * 10)
        # first entries: sin(2^k * 0.5)
        expected = np.sin(2.0 ** np.arange(10) * 0.5)
        np.testing.assert_allclose(np.asarray(out)[0, :10], expected, atol=1e-5)


class TestFastQuaternionAverage:
    def test_matches_eigh_on_clusters(self):
        """Power-iteration average == exact eigh average on clustered inputs
        (the aggregation pipeline's regime: retained candidates near a mode)."""
        from genpose2_tpu.so3.rotations import (
            average_quaternion_batch,
            average_quaternion_batch_fast,
        )

        rng = np.random.default_rng(5)
        B, K = 16, 20
        base = rng.normal(size=(B, 1, 4))
        base /= np.linalg.norm(base, axis=-1, keepdims=True)
        noise = rng.normal(size=(B, K, 4)) * 0.15
        Q = base + noise
        Q /= np.linalg.norm(Q, axis=-1, keepdims=True)
        Q = jnp.asarray(Q, jnp.float32)
        w = jnp.asarray(np.abs(rng.normal(size=(B, K))) + 0.1, jnp.float32)
        exact = np.asarray(average_quaternion_batch(Q, w))
        fast = np.asarray(average_quaternion_batch_fast(Q, w))
        # same quaternion up to sign (both sign-fixed to w>0)
        dots = np.abs(np.sum(exact * fast, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-5)

    def test_matches_eigh_on_imbalanced_bimodal(self):
        """60/40 bimodal candidate sets (surviving symmetry ambiguity):
        lambda2/lambda1 ~ 2/3, power iteration must still match eigh."""
        from genpose2_tpu.so3.rotations import (
            average_quaternion_batch,
            average_quaternion_batch_fast,
        )

        rng = np.random.default_rng(8)
        B, K = 8, 20
        a = rng.normal(size=(B, 1, 4)); a /= np.linalg.norm(a, axis=-1, keepdims=True)
        # second mode: 180-deg-rotated partner (orthogonal quaternion)
        b = rng.normal(size=(B, 1, 4))
        b -= np.sum(b * a, axis=-1, keepdims=True) * a
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        Q = np.concatenate(
            [a + rng.normal(size=(B, 12, 4)) * 0.05, b + rng.normal(size=(B, 8, 4)) * 0.05],
            axis=1,
        )
        Q /= np.linalg.norm(Q, axis=-1, keepdims=True)
        Q = jnp.asarray(Q, jnp.float32)
        exact = np.asarray(average_quaternion_batch(Q))
        fast = np.asarray(average_quaternion_batch_fast(Q))
        dots = np.abs(np.sum(exact * fast, axis=-1))
        np.testing.assert_allclose(dots, 1.0, atol=1e-4)
