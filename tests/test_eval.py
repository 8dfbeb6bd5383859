"""Eval harness tests: aggregation vs a host-side sklearn oracle, symmetry
calibration closed forms, IoU golden values vs the reference numpy math
(sgpa_utils.py:276-297), and the metric curves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from genpose2_tpu import so3
from genpose2_tpu.eval import (
    aggregate_candidates,
    analytic_bbox_lengths,
    batch_criterion,
    calibrate_rotation,
    compute_metrics,
    iou_3d,
    rot_error_deg,
    sym_label,
)
from genpose2_tpu.eval.aggregate import _dbscan_largest_cluster


def reference_aabb_iou(R1, t1, s1, R2, t2, s2):
    """Transcription of sgpa_utils.py:276-297."""
    def corners(R, t, s):
        c = np.array(
            [[+1, +1, +1], [+1, +1, -1], [-1, +1, +1], [-1, +1, -1],
             [+1, -1, +1], [+1, -1, -1], [-1, -1, +1], [-1, -1, -1]], float
        ) * (np.asarray(s) / 2)
        return c @ np.asarray(R).T + np.asarray(t)

    b1, b2 = corners(R1, t1, s1), corners(R2, t2, s2)
    lo1, hi1 = b1.min(0), b1.max(0)
    lo2, hi2 = b2.min(0), b2.max(0)
    lo, hi = np.maximum(lo1, lo2), np.minimum(hi1, hi2)
    inter = 0.0 if np.min(hi - lo) < 0 else np.prod(hi - lo)
    union = np.prod(hi1 - lo1) + np.prod(hi2 - lo2) - inter
    return inter / union


class TestIoU:
    def test_identical_boxes(self):
        R = jnp.eye(3)[None]
        t = jnp.zeros((1, 3))
        s = jnp.asarray([[0.1, 0.2, 0.3]])
        iou = float(iou_3d(R, t, s, R, t, s)[0])
        assert abs(iou - 1.0) < 1e-5

    def test_disjoint_boxes(self):
        R = jnp.eye(3)[None]
        s = jnp.asarray([[0.1, 0.1, 0.1]])
        iou = float(
            iou_3d(R, jnp.zeros((1, 3)), s, R, jnp.asarray([[1.0, 0, 0]]), s)[0]
        )
        assert iou == 0.0

    def test_matches_reference_math(self, rng):
        for _ in range(10):
            R1 = ScipyRot.random(random_state=rng.integers(1 << 30)).as_matrix()
            R2 = ScipyRot.random(random_state=rng.integers(1 << 30)).as_matrix()
            t1 = rng.normal(size=3) * 0.1
            t2 = t1 + rng.normal(size=3) * 0.05
            s1 = rng.uniform(0.05, 0.3, 3)
            s2 = rng.uniform(0.05, 0.3, 3)
            expected = reference_aabb_iou(R1, t1, s1, R2, t2, s2)
            got = float(
                iou_3d(
                    jnp.asarray(R1, jnp.float32)[None], jnp.asarray(t1, jnp.float32)[None],
                    jnp.asarray(s1, jnp.float32)[None], jnp.asarray(R2, jnp.float32)[None],
                    jnp.asarray(t2, jnp.float32)[None], jnp.asarray(s2, jnp.float32)[None],
                )[0]
            )
            assert abs(got - expected) < 1e-4


class TestCalibration:
    def test_continuous_y_symmetry_recovers(self, rng):
        # pred = gt rotated about object's y axis -> calibrated error ~ 0
        R_gt = jnp.asarray(ScipyRot.random(8, random_state=1).as_matrix(), jnp.float32)
        phis = jnp.asarray(rng.uniform(-np.pi, np.pi, 8), jnp.float32)
        Ry = so3.rotations.axis_angle_to_matrix(jnp.asarray([0.0, 1, 0]), phis)
        R_pred = jnp.einsum("bij,bjk->bik", R_gt, Ry)
        sym = jnp.tile(sym_label(y="any")[None], (8, 1))
        err = np.asarray(rot_error_deg(R_pred, R_gt, sym))
        assert err.max() < 0.5

    def test_half_symmetry(self):
        R_gt = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
        R180 = so3.rotations.axis_angle_to_matrix(
            jnp.asarray([0.0, 1, 0]), jnp.asarray(np.pi)
        )
        R_pred = jnp.stack([R180, jnp.eye(3)])
        sym = jnp.tile(sym_label(y="half")[None], (2, 1))
        err = np.asarray(rot_error_deg(R_pred, R_gt, sym))
        assert err.max() < 0.5  # 180-deg flip is in the symmetry group

    def test_quarter_symmetry(self):
        R_gt = jnp.tile(jnp.eye(3)[None], (1, 1, 1))
        R90 = so3.rotations.axis_angle_to_matrix(
            jnp.asarray([0.0, 0, 1]), jnp.asarray(np.pi / 2)
        )[None]
        sym_q = jnp.tile(sym_label(z="quarter")[None], (1, 1))
        sym_h = jnp.tile(sym_label(z="half")[None], (1, 1))
        assert float(rot_error_deg(R90, R_gt, sym_q)[0]) < 0.5
        assert abs(float(rot_error_deg(R90, R_gt, sym_h)[0]) - 90.0) < 0.5

    def test_no_symmetry_unchanged(self):
        R_gt = jnp.tile(jnp.eye(3)[None], (1, 1, 1))
        R30 = so3.rotations.axis_angle_to_matrix(
            jnp.asarray([1.0, 0, 0]), jnp.asarray(np.pi / 6)
        )[None]
        sym = jnp.tile(sym_label()[None], (1, 1))
        err = float(rot_error_deg(R30, R_gt, sym)[0])
        assert abs(err - 30.0) < 0.1

    def test_global_any(self):
        R_gt = jnp.tile(jnp.eye(3)[None], (1, 1, 1))
        R_pred = jnp.asarray(ScipyRot.random(1, random_state=3).as_matrix(), jnp.float32)
        sym = jnp.tile(sym_label(any_sym=True)[None], (1, 1))
        assert float(rot_error_deg(R_pred, R_gt, sym)[0]) == 0.0


class TestDBSCAN:
    def test_matches_sklearn_on_row_features(self, rng):
        from sklearn.cluster import DBSCAN

        for trial in range(5):
            q = rng.normal(size=(20, 4))
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            D = 1 - (q @ q.T) ** 2
            eps, min_samples = 0.05 + 0.2 * rng.random(), 3
            sk = DBSCAN(eps=eps, min_samples=min_samples).fit(D)
            labels = sk.labels_
            row_dist = np.linalg.norm(D[:, None, :] - D[None, :, :], axis=-1)
            mask, found = _dbscan_largest_cluster(
                jnp.asarray(row_dist, jnp.float32), eps, min_samples
            )
            mask = np.asarray(mask)
            if np.any(labels >= 0):
                bins = np.bincount(labels[labels >= 0])
                best = np.argmax(bins)
                expected = labels == best
                assert bool(found)
                # same cluster size; membership can differ only on ties
                assert mask.sum() == expected.sum(), f"trial {trial}"
            else:
                assert not bool(found) or mask.sum() == 0

    def test_aggregation_recovers_mode(self, rng):
        # 15 candidates near identity + 5 outliers near a 120-deg rotation:
        # clustering must pick the majority mode
        key = jax.random.PRNGKey(0)
        R_main = jnp.tile(jnp.eye(3)[None], (15, 1, 1))
        R_main = so3.add_noise_to_R(key, R_main, 3.0)
        R_out = jnp.asarray(
            ScipyRot.from_euler("z", 120, degrees=True).as_matrix(), jnp.float32
        )
        R_out = so3.add_noise_to_R(key, jnp.tile(R_out[None], (5, 1, 1)), 3.0)
        Rs = jnp.concatenate([R_main, R_out])
        poses = jnp.concatenate(
            [so3.matrix_to_rot6d_cols(Rs), jnp.zeros((20, 3))], axis=-1
        )[None]
        out = aggregate_candidates(poses, None, retain_ratio=1.0)
        ang = float(so3.rotation_angle_deg(out["rotation"][0], jnp.eye(3)))
        assert ang < 10.0, ang

    def test_aggregation_shapes_and_trans(self):
        B, K = 3, 10
        key = jax.random.PRNGKey(1)
        Rs = so3.quaternion_to_matrix(jax.random.normal(key, (B, K, 4)))
        trans = jnp.tile(jnp.asarray([0.1, 0.2, 0.3]), (B, K, 1))
        poses = jnp.concatenate(
            [so3.matrix_to_rot6d_cols(Rs.reshape(B * K, 3, 3)).reshape(B, K, 6), trans],
            axis=-1,
        )
        energies = jax.random.normal(key, (B, K, 2))
        out = aggregate_candidates(poses, energies)
        assert out["rotation"].shape == (B, 3, 3)
        np.testing.assert_allclose(np.asarray(out["translation"]), trans[:, 0], atol=1e-5)


class TestAnalyticScale:
    def test_recovers_box_lengths(self, rng):
        from genpose2_tpu.data.synthetic import SyntheticPoseData

        data = SyntheticPoseData(num_points=512, noise=0.0)
        batch = data.batch(jax.random.PRNGKey(0), 4)
        lengths = analytic_bbox_lengths(
            batch["cam_pts"], batch["gt_rotation"], batch["gt_translation"]
        )
        np.testing.assert_allclose(
            np.asarray(lengths), np.asarray(batch["bbox_side_len"]), rtol=0.08
        )


class TestCriterionAndMetrics:
    def test_perfect_prediction(self):
        R = jnp.asarray(ScipyRot.random(6, random_state=0).as_matrix(), jnp.float32)
        t = jnp.asarray(np.random.default_rng(0).normal(size=(6, 3)), jnp.float32)
        s = jnp.tile(jnp.asarray([[0.1, 0.2, 0.3]]), (6, 1))
        sym = jnp.tile(sym_label()[None], (6, 1))
        iou, deg, sht = batch_criterion(R, t, s, R, t, s, sym)
        np.testing.assert_allclose(np.asarray(iou), 1.0, atol=1e-4)
        assert np.asarray(deg).max() < 0.1
        np.testing.assert_allclose(np.asarray(sht), 0.0, atol=1e-5)

    def test_metric_aggregation(self):
        iou = np.array([0.9, 0.6, 0.3, 0.1])
        deg = np.array([1.0, 4.0, 8.0, 30.0])
        sht = np.array([0.5, 1.5, 4.0, 10.0])
        m = compute_metrics(iou, deg, sht)
        assert m.iou_acc[0.25] == 0.75
        assert m.iou_acc[0.5] == 0.5
        assert m.pose_acc[(5, 2)] == 0.5
        assert m.pose_acc[(10, 5)] == 0.75
        assert 0 < m.pose_auc[(5.0, 2.0)] < 1
        m2 = compute_metrics(iou, deg, sht, class_labels=np.array([0, 0, 1, 1]))
        assert set(m2.per_class) == {0, 1}
        assert abs(m2.iou_acc[0.25] - 0.75) < 1e-6  # class means here equal overall


class TestMitsubaExport:
    def test_scene_xml_wellformed(self, tmp_path):
        """Mitsuba scene export: valid XML, standardized cloud, one sphere per
        point (reference: utils/visualize.py:380-499)."""
        import xml.etree.ElementTree as ET

        from genpose2_tpu.utils.visualize import export_mitsuba_xml

        rng = np.random.default_rng(0)
        pcl = rng.normal(size=(200, 3)) * 0.1 + np.array([0.0, 0.0, 0.6])
        path = str(tmp_path / "scene.xml")
        xml = export_mitsuba_xml(pcl, path, max_points=128)
        root = ET.parse(path).getroot()
        spheres = [s for s in root.iter("shape") if s.get("type") == "sphere"]
        assert len(spheres) == 128
        # standardized coordinates stay within the unit box
        for s in spheres[:5]:
            pt = s.find("point")
            assert abs(float(pt.get("x"))) <= 0.5 + 1e-6
        assert xml.startswith("<?xml")
