"""Native host-core tests: builds native/libgp2_host.so and checks each entry
point against the numpy/cv2 reference math, plus a throughput sanity check."""

import numpy as np
import pytest

from genpose2_tpu.data import native
from genpose2_tpu.data.roi import get_affine_transform


@pytest.fixture(scope="module", autouse=True)
def built():
    assert native.available(), "native library failed to build"


class TestMaskBbox:
    def test_matches_numpy(self, rng):
        mask = rng.integers(0, 4, size=(120, 160)).astype(np.int32)
        count, (r0, r1, c0, c1) = native.mask_bbox(mask, 2)
        sel = mask == 2
        assert count == sel.sum()
        ys, xs = np.nonzero(sel)
        assert (r0, r1, c0, c1) == (ys.min(), ys.max(), xs.min(), xs.max())

    def test_empty(self):
        mask = np.zeros((10, 10), np.int32)
        count, _ = native.mask_bbox(mask, 5)
        assert count == 0


class TestWarp:
    def test_matches_cv2_nearest(self, rng):
        import cv2

        src = rng.random((100, 130)).astype(np.float32)
        M = get_affine_transform(np.array([60.0, 45.0]), 70.0, 0, (64, 64))
        ours = native.warp_nearest(src, M, 64, 64)
        cv = cv2.warpAffine(src, M, (64, 64), flags=cv2.INTER_NEAREST)
        # nearest-neighbor rounding differs from cv2's fixed-point rounding
        # exactly on .5 source ties (whole tied columns); require near-total
        # agreement and that every disagreement is a tie column
        agree = np.mean(ours == cv)
        assert agree > 0.95, agree
        import cv2 as _cv2

        inv = _cv2.invertAffineTransform(M)
        ys, xs = np.nonzero(ours != cv)
        src_x = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
        src_y = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
        is_tie = (np.abs(src_x - np.floor(src_x) - 0.5) < 1e-6) | (
            np.abs(src_y - np.floor(src_y) - 0.5) < 1e-6
        )
        assert is_tie.all()


class TestExtractCloud:
    def test_backprojection_matches(self, rng):
        h, w = 64, 64
        depth = rng.uniform(0.4, 0.8, (h, w)).astype(np.float32)
        depth[rng.random((h, w)) < 0.3] = 0
        mask = (rng.random((h, w)) < 0.7).astype(np.uint8)
        cx_map = np.tile(np.arange(w, dtype=np.float32)[None], (h, 1)) + 100
        cy_map = np.tile(np.arange(h, dtype=np.float32)[:, None], (1, w)) + 50
        fx = fy = 280.0
        cx, cy = 160.0, 120.0
        n_valid, pts, rows, cols = native.extract_cloud(
            depth, mask, cx_map, cy_map, fx, fy, cx, cy, n_pts=256, seed=3
        )
        assert n_valid == int(((depth > 0) & (mask > 0)).sum())
        # each returned point is the exact backprojection of its pixel
        z = depth[rows, cols]
        np.testing.assert_allclose(pts[:, 2], z, rtol=1e-6)
        np.testing.assert_allclose(
            pts[:, 0], (cx_map[rows, cols] - cx) * z / fx, rtol=1e-5
        )
        np.testing.assert_allclose(
            pts[:, 1], (cy_map[rows, cols] - cy) * z / fy, rtol=1e-5
        )
        # sampling without replacement when enough points
        if n_valid >= 256:
            keys = rows.astype(np.int64) * w + cols
            assert len(np.unique(keys)) == 256

    def test_padding_when_few_points(self):
        h, w = 16, 16
        depth = np.zeros((h, w), np.float32)
        depth[3, 4] = 0.5
        depth[5, 6] = 0.6
        mask = np.ones((h, w), np.uint8)
        cxm = np.zeros((h, w), np.float32)
        cym = np.zeros((h, w), np.float32)
        n_valid, pts, rows, cols = native.extract_cloud(
            depth, mask, cxm, cym, 280, 280, 160, 120, n_pts=8, seed=0
        )
        assert n_valid == 2
        assert pts.shape == (8, 3)
        assert set(zip(rows.tolist(), cols.tolist())) == {(3, 4), (5, 6)}

    def test_empty(self):
        h, w = 8, 8
        n_valid, pts, _, _ = native.extract_cloud(
            np.zeros((h, w), np.float32),
            np.ones((h, w), np.uint8),
            np.zeros((h, w), np.float32),
            np.zeros((h, w), np.float32),
            280, 280, 160, 120, n_pts=8,
        )
        assert n_valid == 0 and pts is None
