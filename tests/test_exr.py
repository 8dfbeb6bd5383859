"""Round-trip and format tests for the built-in OpenEXR scanline codec
(genpose2_tpu/data/exr.py) — needed because many OpenCV builds ship without
the OpenEXR codec while Omni6DPose depth/mask files are EXR."""

import numpy as np
import pytest

from genpose2_tpu.data.exr import read_exr, write_exr


class TestExrCodec:
    @pytest.mark.parametrize("comp", ["none", "zip", "zips"])
    @pytest.mark.parametrize("dtype", [np.float32, np.float16, np.uint32])
    def test_roundtrip_single_channel(self, tmp_path, comp, dtype):
        rng = np.random.default_rng(0)
        img = (rng.random((37, 53)) * 100).astype(dtype)
        p = str(tmp_path / "t.exr")
        write_exr(p, img, comp)
        back = read_exr(p)
        assert back.dtype == img.dtype
        np.testing.assert_array_equal(back, img)

    @pytest.mark.parametrize("comp", ["none", "zip"])
    def test_roundtrip_three_channel(self, tmp_path, comp):
        rng = np.random.default_rng(1)
        img = (rng.random((16, 21, 3)) * 10).astype(np.float32)
        p = str(tmp_path / "t3.exr")
        write_exr(p, img, comp)
        np.testing.assert_array_equal(read_exr(p), img)

    def test_zip_chunking_regions(self, tmp_path):
        # heights around the 16-scanline ZIP chunk boundary
        for H in (15, 16, 17, 33):
            img = np.arange(H * 20, dtype=np.float32).reshape(H, 20)
            p = str(tmp_path / f"h{H}.exr")
            write_exr(p, img, "zip")
            np.testing.assert_array_equal(read_exr(p), img)

    def test_depth_loader_uses_builtin_codec(self, tmp_path):
        """load_depth falls back to the numpy codec when cv2 lacks EXR."""
        from genpose2_tpu.data.omni6dpose import load_depth

        depth = np.full((8, 10), 0.65, np.float32)
        depth[0, 0] = 2e3  # beyond-range value must be zeroed
        write_exr(str(tmp_path / "x_depth.exr"), depth, "zip")
        d = load_depth(str(tmp_path / "x_"))
        assert d.dtype == np.float32
        assert d[0, 0] == 0.0
        np.testing.assert_allclose(d[1:], depth[1:])

    def test_native_chunk_decode_matches_python(self, tmp_path, monkeypatch):
        """The C chunk decoder (gp2_exr_chunk: inflate + predictor +
        deinterleave in one pass) must be byte-exact vs the numpy path,
        including odd-byte chunks and multi-channel scanlines."""
        from genpose2_tpu.data import native

        if native.get_lib() is None or not hasattr(native.get_lib(), "gp2_exr_chunk"):
            pytest.skip("native library unavailable")

        rng = np.random.default_rng(7)
        imgs = [
            (rng.random((37, 53)) * 100).astype(np.float32),  # odd row bytes
            (rng.random((33, 21, 3)) * 10).astype(np.float32),
            (rng.random((17, 19)) * 100).astype(np.float16),
        ]
        for i, img in enumerate(imgs):
            p = str(tmp_path / f"n{i}.exr")
            write_exr(p, img, "zip")
            a = read_exr(p)  # native path
            monkeypatch.setenv("GP2_DISABLE_NATIVE", "1")
            b = read_exr(p)  # numpy path
            monkeypatch.delenv("GP2_DISABLE_NATIVE")
            np.testing.assert_array_equal(a, b)
            np.testing.assert_array_equal(a, img)

    def test_rejects_non_exr(self, tmp_path):
        p = tmp_path / "bad.exr"
        p.write_bytes(b"not an exr file at all")
        with pytest.raises(ValueError):
            read_exr(str(p))
