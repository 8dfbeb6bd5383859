"""Tests for the BOP (XYZ-IBD) loader and the tracking video dataset, over
fabricated on-disk fixtures."""

import json
import os

import cv2
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from genpose2_tpu.config import DataConfig
from genpose2_tpu.data.tracking import TrackingVideoDataset, open_video_datasets
from genpose2_tpu.data.xyzibd import XyzibdDataset, bop_symmetry_label
from tests.test_data import render_box_scene


class TestBopSymmetry:
    def test_continuous_axis(self):
        mi = {"symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]}
        np.testing.assert_array_equal(bop_symmetry_label(mi), [0, 0, 0, 1])

    def test_discrete_half(self):
        R = ScipyRot.from_euler("z", 180, degrees=True).as_matrix()
        M = np.eye(4)
        M[:3, :3] = R
        mi = {"symmetries_discrete": [M.reshape(-1).tolist()]}
        np.testing.assert_array_equal(bop_symmetry_label(mi), [0, 0, 0, 2])

    def test_discrete_quarter(self):
        mats = []
        for deg in (90, 180, 270):
            M = np.eye(4)
            M[:3, :3] = ScipyRot.from_euler("y", deg, degrees=True).as_matrix()
            mats.append(M.reshape(-1).tolist())
        mi = {"symmetries_discrete": mats}
        np.testing.assert_array_equal(bop_symmetry_label(mi), [0, 0, 3, 0])

    def test_no_symmetry(self):
        np.testing.assert_array_equal(bop_symmetry_label({}), [0, 0, 0, 0])


@pytest.fixture(scope="module")
def bop_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("bop")
    K = np.array([[280.0, 0, 160], [0, 280.0, 120], [0, 0, 1]])
    size_mm = np.array([120.0, 200.0, 80.0])
    models = {
        "5": {
            "size_x": 120.0, "size_y": 200.0, "size_z": 80.0,
            "symmetries_continuous": [{"axis": [0, 1, 0], "offset": [0, 0, 0]}],
        }
    }
    os.makedirs(root / "models")
    with open(root / "models" / "models_info.json", "w") as f:
        json.dump(models, f)

    split = root / "test"
    scene = split / "000001"
    for sub in ("rgb", "depth", "mask_visib"):
        os.makedirs(scene / sub)
    scene_gt, scene_info, scene_cam = {}, {}, {}
    for im in range(2):
        R = ScipyRot.random(random_state=im).as_matrix()
        t = np.array([0.01, -0.02, 0.7])
        depth, mask = render_box_scene(K, R, t, size_mm / 1000.0)
        cv2.imwrite(str(scene / "rgb" / f"{im:06d}.png"), np.full((240, 320, 3), 90, np.uint8))
        cv2.imwrite(str(scene / "depth" / f"{im:06d}.png"), (depth * 1000).astype(np.uint16))
        cv2.imwrite(str(scene / "mask_visib" / f"{im:06d}_{0:06d}.png"), ((mask > 0) * 255).astype(np.uint8))
        scene_gt[str(im)] = [
            {
                "obj_id": 5,
                "cam_R_m2c": R.reshape(-1).tolist(),
                "cam_t_m2c": (t * 1000).tolist(),
            }
        ]
        scene_info[str(im)] = [{"visib_fract": 0.9, "px_count_valid": int((mask > 0).sum())}]
        scene_cam[str(im)] = {"cam_K": K.reshape(-1).tolist(), "depth_scale": 1.0}
    for name, blob in (
        ("scene_gt.json", scene_gt),
        ("scene_gt_info.json", scene_info),
        ("scene_camera.json", scene_cam),
    ):
        with open(scene / name, "w") as f:
            json.dump(blob, f)
    return str(root)


class TestXyzibd:
    def test_loads_and_geometry(self, bop_root):
        cfg = DataConfig(num_points=256, img_size=128)
        ds = XyzibdDataset(cfg, os.path.join(bop_root, "test"), mode="test")
        assert len(ds) == 2
        s = ds[0]
        assert s["pcl_in"].shape == (256, 3)
        np.testing.assert_array_equal(s["sym_info"], [0, 0, 1, 0])  # y-continuous
        np.testing.assert_allclose(s["bbox_side_len"], [0.12, 0.2, 0.08], atol=1e-6)
        # depth unit conversion: cloud z near 0.7 m
        assert 0.5 < s["pcl_in"][:, 2].mean() < 0.9
        # pose roundtrip: object points on box
        R, t = s["rotation"], s["translation"]
        obj_pts = (s["pcl_in"] - t) @ R
        face_ratio = np.max(np.abs(obj_pts) / (np.array([0.12, 0.2, 0.08]) / 2), axis=1)
        assert np.percentile(np.abs(face_ratio - 1), 90) < 0.12

    def test_visibility_filter_raises(self, bop_root):
        cfg = DataConfig(num_points=128, img_size=64)
        with pytest.raises(FileNotFoundError):
            XyzibdDataset(
                cfg, os.path.join(bop_root, "test"), mode="test", min_visib_fract=0.95
            )

    def test_translation_stats_roundtrip(self, bop_root, tmp_path):
        """compute-from-split + save/load + per-sample normalization
        (reference: xyzibd_dataset.py:16-32, 152, 796-804)."""
        from genpose2_tpu.data.xyzibd import (
            compute_translation_stats,
            load_translation_stats,
            save_translation_stats,
        )

        cfg = DataConfig(num_points=128, img_size=64)
        ds = XyzibdDataset(cfg, os.path.join(bop_root, "test"), mode="test")
        mean, std = compute_translation_stats(ds)
        # fixture: both frames share t=(0.01,-0.02,0.7) -> mean exact, std
        # floors at 1.0 (the reference's 1e-8 guard)
        np.testing.assert_allclose(mean, [0.01, -0.02, 0.7], atol=1e-6)
        np.testing.assert_allclose(std, 1.0, atol=1e-6)
        save_translation_stats(str(tmp_path), mean, std)
        m2, s2 = load_translation_stats(str(tmp_path))
        np.testing.assert_allclose(m2, mean)
        np.testing.assert_allclose(s2, std)

        ds2 = XyzibdDataset(
            cfg, os.path.join(bop_root, "test"), mode="test",
            trans_mean=m2, trans_std=s2,
        )
        s = ds2[0]
        np.testing.assert_allclose(
            s["normalized_translation"], (s["translation"] - m2) / s2, atol=1e-6
        )
        np.testing.assert_allclose(s["trans_mean"], m2)
        np.testing.assert_allclose(s["trans_std"], s2)


@pytest.fixture(scope="module")
def bop_multicam_root(tmp_path_factory):
    """BOP scene with the reference's per-camera suffixed val layout
    (xyzibd_dataset.py:583-608): realsense publishes rgb_<cam>, the
    structured-light cameras publish gray_<cam>."""
    root = tmp_path_factory.mktemp("bop_mc")
    K = np.array([[280.0, 0, 160], [0, 280.0, 120], [0, 0, 1]])
    size_mm = np.array([120.0, 200.0, 80.0])
    models = {"5": {"size_x": 120.0, "size_y": 200.0, "size_z": 80.0}}
    os.makedirs(root / "models")
    with open(root / "models" / "models_info.json", "w") as f:
        json.dump(models, f)
    scene = root / "val" / "000001"
    cam_layout = {"xyz": "gray", "realsense": "rgb"}
    for cam, (img_dir) in cam_layout.items():
        for sub in (f"{img_dir}_{cam}", f"depth_{cam}", f"mask_visib_{cam}"):
            os.makedirs(scene / sub)
        scene_gt, scene_info, scene_cam = {}, {}, {}
        # different translations per camera so we can tell samples apart
        t = np.array([0.01, -0.02, 0.7 if cam == "xyz" else 0.9])
        R = ScipyRot.random(random_state=7).as_matrix()
        depth, mask = render_box_scene(K, R, t, size_mm / 1000.0)
        cv2.imwrite(
            str(scene / f"{img_dir}_{cam}" / "000000.png"),
            np.full((240, 320, 3), 90, np.uint8),
        )
        cv2.imwrite(
            str(scene / f"depth_{cam}" / "000000.png"),
            (depth * 1000).astype(np.uint16),
        )
        cv2.imwrite(
            str(scene / f"mask_visib_{cam}" / "000000_000000.png"),
            ((mask > 0) * 255).astype(np.uint8),
        )
        scene_gt["0"] = [{
            "obj_id": 5,
            "cam_R_m2c": R.reshape(-1).tolist(),
            "cam_t_m2c": (t * 1000).tolist(),
        }]
        scene_info["0"] = [
            {"visib_fract": 0.9, "px_count_valid": int((mask > 0).sum())}
        ]
        scene_cam["0"] = {"cam_K": K.reshape(-1).tolist(), "depth_scale": 1.0}
        for name, blob in (
            (f"scene_gt_{cam}.json", scene_gt),
            (f"scene_gt_info_{cam}.json", scene_info),
            (f"scene_camera_{cam}.json", scene_cam),
        ):
            with open(scene / name, "w") as f:
                json.dump(blob, f)
    return str(root)


class TestXyzibdMultiCamera:
    def test_enumerates_all_cameras(self, bop_multicam_root):
        cfg = DataConfig(num_points=128, img_size=64)
        ds = XyzibdDataset(
            cfg, os.path.join(bop_multicam_root, "val"), mode="val",
            cameras=["xyz", "realsense"],
        )
        assert len(ds) == 2  # one frame per camera
        zs = sorted(float(ds[i]["translation"][2]) for i in range(2))
        # each camera's own gt/depth was read (0.7 m vs 0.9 m)
        assert abs(zs[0] - 0.7) < 0.05 and abs(zs[1] - 0.9) < 0.05
        # geometry consistent per camera: cloud depth near its gt z
        for i in range(2):
            s = ds[i]
            assert abs(s["pcl_in"][:, 2].mean() - s["translation"][2]) < 0.1

    def test_missing_camera_warns_and_skips(self, bop_multicam_root):
        cfg = DataConfig(num_points=128, img_size=64)
        with pytest.warns(UserWarning, match="photoneo"):
            ds = XyzibdDataset(
                cfg, os.path.join(bop_multicam_root, "val"), mode="val",
                cameras=["xyz", "realsense", "photoneo"],
            )
        assert len(ds) == 2

    def test_unsuffixed_layout_unaffected(self, bop_root):
        cfg = DataConfig(num_points=128, img_size=64)
        ds = XyzibdDataset(cfg, os.path.join(bop_root, "test"), mode="test")
        assert len(ds) == 2
        assert ds[0]["path"].split(os.sep)[-1].startswith("main_")


@pytest.fixture(scope="module")
def video_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("videos")
    K = np.array([[280.0, 0, 160], [0, 280.0, 120], [0, 0, 1]])
    size = np.array([0.12, 0.2, 0.08])
    vdir = root / "vid0"
    os.makedirs(vdir)
    base_R = ScipyRot.random(random_state=9).as_matrix()
    for i in range(3):
        # slowly rotating object
        dR = ScipyRot.from_euler("y", 4 * i, degrees=True).as_matrix()
        R = base_R @ dR
        t = np.array([0.01 * i, 0.0, 0.65])
        depth, mask = render_box_scene(K, R, t, size)
        prefix = str(vdir / f"{i:04d}_")
        cv2.imwrite(prefix + "color.png", np.full((240, 320, 3), 90, np.uint8))
        cv2.imwrite(prefix + "depth.png", (depth * 1000).astype(np.uint16))
        cv2.imwrite(prefix + "mask.png", mask.astype(np.uint16))
        meta = {
            "camera": {"intrinsics": {"fx": 280.0, "fy": 280.0, "cx": 160.0, "cy": 120.0, "width": 320, "height": 240}},
            "objects": [
                {
                    "is_valid": True,
                    "mask_id": 7,
                    "quaternion_wxyz": ScipyRot.from_matrix(R).as_quat()[[3, 0, 1, 2]].tolist(),
                    "translation": t.tolist(),
                    "meta": {"oid": "obj_a", "class_label": 1, "class_name": "box", "bbox_side_len": size.tolist()},
                }
            ],
        }
        with open(prefix + "meta.json", "w") as f:
            json.dump(meta, f)
    return str(root)


class TestTrackingDataset:
    def test_frames_consistent_order(self, video_root):
        cfg = DataConfig(num_points=128, img_size=64)
        videos = open_video_datasets(cfg, video_root)
        assert len(videos) == 1
        vid = videos[0]
        assert len(vid) == 3
        f0 = vid[0]
        f1 = vid[1]
        assert f0["pcl_in"].shape == (1, 128, 3)
        # same object slot across frames
        assert f0["class_label"][0] == f1["class_label"][0]

    def test_fail_log_on_bad_video(self, video_root, tmp_path):
        cfg = DataConfig(num_points=128, img_size=64)
        bad = os.path.join(str(tmp_path), "badroot")
        os.makedirs(os.path.join(bad, "empty_video"))
        log = os.path.join(str(tmp_path), "fails.txt")
        vids = open_video_datasets(cfg, bad, fail_log=log)
        assert vids == []
        assert os.path.exists(log)
