"""Data-layer tests over a fabricated on-disk mini-dataset: a box rendered
into depth/mask with known intrinsics and pose, written in the Omni6DPose
frame layout, then pulled through the full dataset -> loader -> process_batch
path. Checks geometric consistency: the backprojected cloud must lie on the
GT-posed box surface."""

import json
import os

import cv2
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from genpose2_tpu.config import DataConfig
from genpose2_tpu.data.loader import DataLoader, collate, process_batch
from genpose2_tpu.data.omni6dpose import Omni6DPoseDataset
from genpose2_tpu.data.roi import get_bbox, crop_resize_by_warp_affine, get_2d_coord_np


def render_box_scene(K, R, t, size, im_h=240, im_w=320):
    """Depth-render the 3 visible faces of a box by dense surface sampling."""
    n = 60000
    rng = np.random.default_rng(0)
    face = rng.integers(0, 6, n)
    uv = rng.random((n, 2)) - 0.5
    pts = np.zeros((n, 3))
    ax = face // 2
    sign = np.where(face % 2 == 0, 0.5, -0.5)
    pts[np.arange(n), ax] = sign
    pts[np.arange(n), (ax + 1) % 3] = uv[:, 0]
    pts[np.arange(n), (ax + 2) % 3] = uv[:, 1]
    pts *= size
    cam = pts @ R.T + t
    z = cam[:, 2]
    u = (cam[:, 0] * K[0, 0] / z + K[0, 2]).astype(int)
    v = (cam[:, 1] * K[1, 1] / z + K[1, 2]).astype(int)
    ok = (u >= 0) & (u < im_w) & (v >= 0) & (v < im_h)
    depth = np.zeros((im_h, im_w), np.float32)
    mask = np.zeros((im_h, im_w), np.int32)
    # z-buffer
    order = np.argsort(-z[ok])
    uu, vv, zz = u[ok][order], v[ok][order], z[ok][order]
    depth[vv, uu] = zz
    mask[vv, uu] = 7  # mask_id
    return depth, mask


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("omni_mini")
    K = np.array([[280.0, 0, 160], [0, 280.0, 120], [0, 0, 1]], np.float32)
    size = np.array([0.12, 0.2, 0.08])
    frames = []
    for i in range(3):
        R = ScipyRot.random(random_state=i).as_matrix()
        t = np.array([0.02 * i, -0.01, 0.65])
        depth, mask = render_box_scene(K, R, t, size)
        prefix = os.path.join(str(root), f"frame{i:04d}_")
        rgb = np.full((240, 320, 3), 128, np.uint8)
        cv2.imwrite(prefix + "color.png", rgb)
        cv2.imwrite(
            prefix + "depth.png", (depth * 1000).astype(np.uint16)
        )  # mm png fallback path
        cv2.imwrite(prefix + "mask.png", mask.astype(np.uint16))
        meta = {
            "camera": {
                "intrinsics": {
                    "fx": 280.0, "fy": 280.0, "cx": 160.0, "cy": 120.0,
                    "width": 320, "height": 240,
                }
            },
            "objects": [
                {
                    "is_valid": True,
                    "mask_id": 7,
                    "quaternion_wxyz": ScipyRot.from_matrix(R).as_quat()[[3, 0, 1, 2]].tolist(),
                    "translation": t.tolist(),
                    "meta": {
                        "oid": "box_0",
                        "class_label": 3,
                        "class_name": "box",
                        "bbox_side_len": size.tolist(),
                    },
                }
            ],
        }
        with open(prefix + "meta.json", "w") as f:
            json.dump(meta, f)
        frames.append((prefix, R, t))
    obj_meta = {"instance_dict": {"box_0": {"tag": {"symmetry": {"any": False, "x": "none", "y": "half", "z": "none"}}}}}
    with open(os.path.join(str(root), "obj_meta.json"), "w") as f:
        json.dump(obj_meta, f)
    return str(root), frames, K, size


class TestDataset:
    def _cfg(self):
        return DataConfig(num_points=256, img_size=128, dzi_type="uniform")

    def test_getitem_geometry(self, mini_dataset):
        root, frames, K, size = mini_dataset
        ds = Omni6DPoseDataset(self._cfg(), mode="test", data_dir=root)
        s = ds[0]
        assert s["pcl_in"].shape == (256, 3)
        prefix, R, t = frames[0]
        # cloud points lie on the GT box surface: in the object frame,
        # max |coordinate| relative to half-size ~ 1
        obj_pts = (s["pcl_in"] - t) @ R
        half = size / 2
        ratio = np.abs(obj_pts) / half
        # each point's largest axis ratio should be ~1 (on a face)
        face_ratio = np.max(ratio, axis=1)
        assert np.percentile(np.abs(face_ratio - 1.0), 90) < 0.12
        np.testing.assert_allclose(s["rotation"], R, atol=1e-5)
        np.testing.assert_allclose(s["translation"], t, atol=1e-6)
        np.testing.assert_array_equal(s["sym_info"], [0, 0, 2, 0])
        # sampled pixel coords are consistent with the cloud size
        assert s["roi_xs"].shape == (256,)
        assert s["roi_rgb"].shape == (128, 128, 3)

    def test_train_oversampling_and_retry(self, mini_dataset):
        root, frames, _, _ = mini_dataset
        ds = Omni6DPoseDataset(self._cfg(), mode="train", data_dir=root)
        assert len(ds) == 3 * Omni6DPoseDataset.REPCNT
        s = ds[5]
        assert s["pcl_in"].shape == (256, 3)

    def test_loader_and_process_batch(self, mini_dataset):
        root, frames, _, _ = mini_dataset
        ds = Omni6DPoseDataset(self._cfg(), mode="test", data_dir=root)
        loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2)
        batch = next(iter(loader))
        assert batch["pcl_in"].shape == (2, 256, 3)
        out = process_batch(batch, "rot_matrix")
        assert out["zero_mean_gt_pose"].shape == (2, 9)
        # zero-centering: pts mean ~ 0
        zm = np.asarray(out["zero_mean_pts"])
        np.testing.assert_allclose(zm.mean(axis=1), 0.0, atol=1e-5)
        # gt pose roundtrip: rot cols + translation-center consistency
        np.testing.assert_allclose(
            np.asarray(out["zero_mean_gt_pose"][:, -3:]),
            np.asarray(out["gt_translation"]) - np.asarray(out["pts_center"]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["zero_mean_gt_pose"][:, :3]),
            np.asarray(out["gt_rotation"])[:, :, 0],
            atol=1e-5,
        )

    def test_scale_agent_extras(self, mini_dataset):
        root, _, _, _ = mini_dataset
        ds = Omni6DPoseDataset(
            self._cfg(), mode="train", data_dir=root, agent_type="scale", scale_batch_size=16
        )
        s = ds[0]
        assert s["axes_training"].shape == (16, 3, 3)
        assert s["length_training"].shape == (16, 3)
        # noised axes are valid rotations near GT
        RtR = np.einsum("sij,sik->sjk", s["axes_training"], s["axes_training"])
        np.testing.assert_allclose(RtR, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)


class TestRoiPrimitives:
    def test_get_bbox_square_and_clamped(self):
        r0, r1, c0, c1 = get_bbox([100, 150, 140, 190], 240, 320)
        assert (r1 - r0) == (c1 - c0)  # square
        assert (r1 - r0) % 40 == 0
        assert 0 <= r0 and r1 <= 240 and 0 <= c0 and c1 <= 320

    def test_affine_crop_identity_region(self):
        img = np.arange(100 * 100, dtype=np.float32).reshape(100, 100)
        out = crop_resize_by_warp_affine(img, np.array([50.0, 50.0]), 50, 50, interpolation=cv2.INTER_NEAREST)
        # center crop of 50px around (50,50) resized to 50 = the subimage
        np.testing.assert_allclose(out, img[25:75, 25:75], atol=1e-4)

    def test_coord_map(self):
        xy = get_2d_coord_np(4, 3)
        assert xy.shape == (2, 3, 4)
        assert xy[0, 0, 3] == 3 and xy[1, 2, 0] == 2


class TestShardedLoader:
    def test_shards_are_disjoint_covering_and_equal_length(self):
        """Multi-host sharding: same seeded permutation on every host, disjoint
        equal-length slices, equal batch counts."""
        from genpose2_tpu.data.loader import DataLoader

        class Ds:
            def __len__(self):
                return 103  # deliberately not a multiple of num_shards

            def __getitem__(self, i):
                return {"idx": np.asarray(i)}

        num_shards = 4
        seen = []
        lengths = []
        for s in range(num_shards):
            dl = DataLoader(
                Ds(), batch_size=5, shuffle=True, seed=7, num_workers=2,
                shard_index=s, num_shards=num_shards,
            )
            ids = []
            for b in dl:
                ids.extend(int(v) for v in b["idx"])
            seen.append(set(ids))
            lengths.append(len(ids))
        assert len(set(lengths)) == 1  # equal shard sizes
        assert lengths[0] == 103 // num_shards
        union = set().union(*seen)
        assert sum(len(s) for s in seen) == len(union)  # disjoint
        # deterministic across constructions (same seed, same epoch)
        dl2 = DataLoader(
            Ds(), batch_size=5, shuffle=True, seed=7, num_workers=2,
            shard_index=0, num_shards=num_shards,
        )
        ids2 = [int(v) for b in dl2 for v in b["idx"]]
        assert set(ids2) == seen[0]


@pytest.fixture(scope="module")
def multi_object_dataset(tmp_path_factory):
    """One frame holding TWO boxes (distinct mask ids), plus one single-object
    frame — exercises the eval-mode per-object enumeration."""
    root = tmp_path_factory.mktemp("omni_multi")
    K = np.array([[280.0, 0, 160], [0, 280.0, 120], [0, 0, 1]], np.float32)
    size = np.array([0.1, 0.14, 0.08])
    specs = [
        # frame 0: two objects side by side
        [(np.array([-0.12, 0.0, 0.7]), 7), (np.array([0.12, 0.0, 0.7]), 9)],
        # frame 1: one object
        [(np.array([0.0, 0.0, 0.65]), 7)],
    ]
    for fi, objs in enumerate(specs):
        depth = np.zeros((240, 320), np.float32)
        mask = np.zeros((240, 320), np.int32)
        metas = []
        for t, mid in objs:
            R = ScipyRot.random(random_state=fi * 10 + mid).as_matrix()
            d, m = render_box_scene(K, R, t, size)
            put = (d > 0) & ((depth == 0) | (d < depth))
            depth[put] = d[put]
            mask[put] = mid
            metas.append(
                {
                    "is_valid": True,
                    "mask_id": mid,
                    "quaternion_wxyz": ScipyRot.from_matrix(R)
                    .as_quat()[[3, 0, 1, 2]]
                    .tolist(),
                    "translation": t.tolist(),
                    "meta": {
                        "oid": f"box_{mid}",
                        "class_label": mid,
                        "class_name": f"box{mid}",
                        "bbox_side_len": size.tolist(),
                    },
                }
            )
        prefix = os.path.join(str(root), f"frame{fi:04d}_")
        cv2.imwrite(prefix + "color.png", np.full((240, 320, 3), 128, np.uint8))
        cv2.imwrite(prefix + "depth.png", (depth * 1000).astype(np.uint16))
        cv2.imwrite(prefix + "mask.png", mask.astype(np.uint16))
        meta = {
            "camera": {
                "intrinsics": {
                    "fx": 280.0, "fy": 280.0, "cx": 160.0, "cy": 120.0,
                    "width": 320, "height": 240,
                }
            },
            "objects": metas,
        }
        with open(prefix + "meta.json", "w") as f:
            json.dump(meta, f)
    return str(root)


class TestEvalEnumerationAndRNG:
    def _cfg(self, **kw):
        return DataConfig(num_points=256, img_size=128, dzi_type="uniform", **kw)

    def test_eval_enumerates_every_object(self, multi_object_dataset):
        # reference cumsum indexing visits each valid object exactly once
        # (reference: datasets_omni6dpose.py:179-186, 219-224)
        ds = Omni6DPoseDataset(self._cfg(), mode="test", data_dir=multi_object_dataset)
        assert len(ds) == 3  # 2 objects in frame 0 + 1 in frame 1
        labels = sorted(int(ds[i]["class_label"]) for i in range(len(ds)))
        assert labels == [7, 7, 9]

    def test_eval_per_obj_filter(self, multi_object_dataset):
        ds = Omni6DPoseDataset(
            self._cfg(), mode="test", data_dir=multi_object_dataset, per_obj="box9"
        )
        assert len(ds) == 1
        assert int(ds[0]["class_label"]) == 9

    def test_percentage_data(self, multi_object_dataset):
        full = Omni6DPoseDataset(self._cfg(), mode="train", data_dir=multi_object_dataset)
        half = Omni6DPoseDataset(
            self._cfg(percentage_data=0.5), mode="train", data_dir=multi_object_dataset
        )
        assert len(half) == len(full) // 2
        assert half[0]["pcl_in"].shape == (256, 3)

    def test_threaded_loader_determinism(self, multi_object_dataset):
        # per-sample RNG derived from (seed, epoch, index): concurrent workers
        # cannot corrupt draws, and two identical passes match bit-for-bit
        def run():
            ds = Omni6DPoseDataset(
                self._cfg(), mode="train", data_dir=multi_object_dataset
            )
            dl = DataLoader(ds, batch_size=4, shuffle=True, seed=3, num_workers=4)
            return [np.asarray(b["pcl_in"]) for b in dl]

        a, b = run(), run()
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_epoch_changes_augmentation(self, multi_object_dataset):
        ds = Omni6DPoseDataset(self._cfg(), mode="train", data_dir=multi_object_dataset)
        s0 = ds[0]["pcl_in"]
        ds.epoch = 1
        s1 = ds[0]["pcl_in"]
        assert not np.array_equal(s0, s1)


class TestBenchSceneGenerator:
    """The DATA_BENCH harness's multi-object scene generator
    (scripts/bench_dataloader.py:fabricate) must produce datasets the real
    loader path consumes with correct per-object geometry — it backs the
    committed DATA_BENCH_r05.json loader numbers."""

    def test_fabricated_scene_roundtrips_through_dataset(self, tmp_path):
        import sys

        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "scripts")
        )
        import bench_dataloader as bd

        bd.fabricate(str(tmp_path), num_frames=3, objects_per_frame=4)
        cfg = DataConfig(num_points=256, img_size=64, dzi_type="none")
        ds = Omni6DPoseDataset(cfg, mode="test", data_dir=str(tmp_path))
        # frames carry a MIX of object counts (2..6 at objects_per_frame=4)
        assert len(ds) >= 3 * 2
        seen_frames = set()
        for i in range(len(ds)):
            s = ds[i]
            # backprojected cloud must sit on the object: camera-frame points
            # mapped into the object frame lie within the half-diagonal
            R = np.asarray(s["rotation"])
            t = np.asarray(s["translation"])
            obj_pts = (np.asarray(s["pcl_in"]) - t) @ R
            half = np.asarray(s["bbox_side_len"]) / 2
            assert (np.abs(obj_pts) < half[None] * 1.5 + 0.02).mean() > 0.95
            seen_frames.add(int(i))
        assert len(seen_frames) == len(ds)
