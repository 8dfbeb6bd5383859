"""Golden tests pinning the metric sweep semantics.

The reference's eval prints come from cutoop's Metrics with explicit sweep
ranges passed at the call site (reference: runners/evaluation_single.py:
335-370). Two things are pinned here:

1. the sweep RANGES themselves — transcribed verbatim from the reference call
   site (iou_auc_ranges / pose_auc_ranges, evaluation_single.py:345-356);
2. the sweep SEMANTICS on hand-computed fixtures — IoU-AUC = mean over
   thresholds t in arange(lo, hi, step) of acc(iou > t); VUS = mean over the
   (deg, trans) threshold grid of acc(deg < d AND sht < s); class-means
   average per-class metrics. Any change to a bound or step shifts these
   literal numbers and fails the test.
"""

import numpy as np

from genpose2_tpu.eval.metrics import (
    _IOU_AUC_RANGES,
    _POSE_AUC_RANGES,
    compute_metrics,
)

IOU = np.array([0.3, 0.6, 0.9])
DEG = np.array([1.0, 4.0, 12.0])
SHT = np.array([0.5, 3.0, 1.0])


class TestSweepConstants:
    def test_ranges_match_reference_call_site(self):
        # reference: evaluation_single.py:345-349
        assert _IOU_AUC_RANGES == [(0.25, 1.0, 0.075), (0.5, 1.0, 0.005), (0.75, 1.0, 0.0025)]
        # reference: evaluation_single.py:350-356
        assert _POSE_AUC_RANGES == [
            ((0.0, 5.0, 0.05), (0.0, 2.0, 0.02)),
            ((0.0, 5.0, 0.05), (0.0, 5.0, 0.05)),
            ((0.0, 10.0, 0.1), (0.0, 2.0, 0.02)),
            ((0.0, 10.0, 0.1), (0.0, 5.0, 0.05)),
        ]

    def test_threshold_counts(self):
        # arange over (0.25, 1, 0.075) -> exactly 10 thresholds;
        # (0.5, 1, 0.005) and (0.75, 1, 0.0025) -> 100 each
        for (lo, hi, step), n in zip(_IOU_AUC_RANGES, (10, 100, 100)):
            assert len(np.arange(lo, hi, step)) == n


class TestGoldenValues:
    def test_iou_auc(self):
        m = compute_metrics(IOU, DEG, SHT)
        np.testing.assert_allclose(m.iou_auc[0.25], 0.5, atol=1e-9)
        np.testing.assert_allclose(m.iou_auc[0.5], 0.3333333333, atol=1e-9)
        np.testing.assert_allclose(m.iou_auc[0.75], 0.2033333333, atol=1e-9)

    def test_vus(self):
        m = compute_metrics(IOU, DEG, SHT)
        np.testing.assert_allclose(m.pose_auc[(5, 2)], 0.2, atol=1e-9)
        np.testing.assert_allclose(m.pose_auc[(5, 5)], 0.2666666667, atol=1e-9)
        np.testing.assert_allclose(m.pose_auc[(10, 2)], 0.225, atol=1e-9)
        np.testing.assert_allclose(m.pose_auc[(10, 5)], 0.35, atol=1e-9)

    def test_accuracies_strict_inequalities(self):
        m = compute_metrics(IOU, DEG, SHT)
        np.testing.assert_allclose(
            [m.iou_acc[t] for t in (0.25, 0.5, 0.75)], [1.0, 2 / 3, 1 / 3]
        )
        np.testing.assert_allclose(
            [m.pose_acc[k] for k in ((5, 2), (5, 5), (10, 2), (10, 5))],
            [1 / 3, 2 / 3, 1 / 3, 2 / 3],
        )

    def test_analytic_uniform_auc(self):
        """For iou ~ dense uniform grid on [0, 1], acc(iou > t) = 1 - t, so
        IoU-AUC over (lo, hi, step) -> mean of (1 - t) — an implementation-
        independent cross-check of the sweep semantics."""
        iou = np.linspace(0, 1, 100001)
        m = compute_metrics(iou, np.ones_like(iou), np.ones_like(iou))
        for lo, hi, step in _IOU_AUC_RANGES:
            ts = np.arange(lo, hi, step)
            np.testing.assert_allclose(m.iou_auc[lo], np.mean(1 - ts), atol=1e-4)

    def test_class_means(self):
        """Top-level numbers are CLASS MEANS (cutoop Metrics.class_means):
        2 classes with different accuracies -> plain average of the two."""
        iou = np.array([0.9, 0.9, 0.1, 0.9])
        deg = np.array([1.0, 1.0, 20.0, 1.0])
        sht = np.array([0.1, 0.1, 9.0, 0.1])
        labels = np.array([0, 0, 1, 1])
        m = compute_metrics(iou, deg, sht, class_labels=labels)
        # class 0: acc@0.25 = 1.0; class 1: acc = 0.5 -> mean 0.75
        np.testing.assert_allclose(m.iou_acc[0.25], 0.75)
        # instance-level mean would be 3/4 too here, so also check deg:
        # class means of deg: (1.0, 10.5) -> 5.75 (instance mean = 5.75 too);
        # use pose_acc where they differ: class0 1.0, class1 0.5 -> 0.75
        np.testing.assert_allclose(m.pose_acc[(5, 2)], 0.75)
        assert set(m.per_class) == {0, 1}
