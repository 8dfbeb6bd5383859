// Native host-side data-path core for genpose2_tpu.
//
// The reference's native layer is its CUDA point-op kernels
// (reference: networks/pts_encoder/pointnet2_utils/pointnet2/src/) — on TPU
// those became Pallas kernels (genpose2_tpu/ops). The host-side per-sample
// data loop (mask scan -> affine crop -> depth backprojection -> point
// sampling; reference: datasets/datasets_omni6dpose.py:262-332) is the other
// hot path: it runs once per object per frame on the CPU while the TPU
// consumes batches. This library implements that loop in C++ with a C ABI
// consumed via ctypes (no pybind11 in this image).
//
// Build: make -C native   (produces libgp2_host.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>

#include <zlib.h>

extern "C" {

// Decode one OpenEXR ZIP/ZIPS chunk: inflate, then the spec's post-inflate
// reorder (ImfZip.cpp reconstruct + interleave) in one pass. The Python
// codec (genpose2_tpu/data/exr.py) does the same with zlib + three
// vectorized numpy passes and per-chunk temporaries; this fuses the
// predictor scan and the deinterleave into a single cache-resident sweep.
// z/zlen = compressed chunk, out/expect = decoded scanline block.
// Returns expect on success, -1 on inflate error/size mismatch.
int gp2_exr_chunk(const uint8_t* z, int zlen, uint8_t* out, int expect) {
  uint8_t* tmp = new uint8_t[expect];
  uLongf dlen = (uLongf)expect;
  if (uncompress(tmp, &dlen, z, (uLong)zlen) != Z_OK || (int)dlen != expect) {
    delete[] tmp;
    return -1;
  }
  // predictor: t[i] = t[i] + t[i-1] - 128 (mod 256), sequential scan
  for (int i = 1; i < expect; ++i) tmp[i] = (uint8_t)(tmp[i] + tmp[i - 1] - 128);
  // deinterleave: even output bytes from the first half, odd from the second
  const int half = (expect + 1) / 2;
  const uint8_t* a = tmp;
  const uint8_t* b = tmp + half;
  const int pairs = expect - half;
  for (int j = 0; j < pairs; ++j) {
    out[2 * j] = a[j];
    out[2 * j + 1] = b[j];
  }
  if (expect & 1) out[expect - 1] = a[half - 1];
  delete[] tmp;
  return expect;
}

// Bounding box of mask pixels equal to mask_id.
// out = {rmin, rmax, cmin, cmax}; returns pixel count.
int gp2_mask_bbox(const int32_t* mask, int h, int w, int mask_id, int32_t* out) {
  int rmin = h, rmax = -1, cmin = w, cmax = -1, count = 0;
  for (int r = 0; r < h; ++r) {
    const int32_t* row = mask + (size_t)r * w;
    for (int c = 0; c < w; ++c) {
      if (row[c] == mask_id) {
        ++count;
        if (r < rmin) rmin = r;
        if (r > rmax) rmax = r;
        if (c < cmin) cmin = c;
        if (c > cmax) cmax = c;
      }
    }
  }
  out[0] = rmin; out[1] = rmax; out[2] = cmin; out[3] = cmax;
  return count;
}

// Nearest-neighbor inverse-affine crop of a float32 image.
// M is the 2x3 FORWARD affine (src -> dst), as produced by
// get_affine_transform; we invert it here. Out-of-range samples are 0.
void gp2_warp_nearest_f32(const float* src, int sh, int sw, const double* M,
                          float* dst, int dh, int dw) {
  // invert [a b c; d e f]
  const double a = M[0], b = M[1], c = M[2], d = M[3], e = M[4], f = M[5];
  const double det = a * e - b * d;
  const double ia = e / det, ib = -b / det, id = -d / det, ie = a / det;
  const double ic = -(ia * c + ib * f), iff = -(id * c + ie * f);
  for (int y = 0; y < dh; ++y) {
    for (int x = 0; x < dw; ++x) {
      const double sx = ia * x + ib * y + ic;
      const double sy = id * x + ie * y + iff;
      const int xi = (int)std::lround(sx);
      const int yi = (int)std::lround(sy);
      dst[(size_t)y * dw + x] =
          (xi >= 0 && xi < sw && yi >= 0 && yi < sh)
              ? src[(size_t)yi * sw + xi]
              : 0.0f;
    }
  }
}

// Backproject valid (depth > 0 && mask > 0) pixels of a crop and sample
// exactly n_pts of them (Fisher-Yates when enough, tile+head padding
// otherwise, mirroring datasets_omni6dpose.py:445-477).
//   roi_depth (h*w), roi_mask (h*w) uint8, coord_x/coord_y (h*w): original-
//   image pixel coordinates of each crop pixel.
// Outputs: out_pts (n_pts*3), out_rows/out_cols (n_pts) crop-pixel coords.
// Returns the number of valid pixels found (0 => nothing written).
int gp2_extract_cloud(const float* roi_depth, const uint8_t* roi_mask,
                      const float* coord_x, const float* coord_y, int h, int w,
                      float fx, float fy, float cx, float cy, uint64_t seed,
                      int n_pts, float* out_pts, int32_t* out_rows,
                      int32_t* out_cols) {
  const int total = h * w;
  // collect valid pixel indices
  int32_t* valid = new int32_t[total];
  int n_valid = 0;
  for (int i = 0; i < total; ++i) {
    if (roi_depth[i] > 0.0f && roi_mask[i] > 0) valid[n_valid++] = i;
  }
  if (n_valid == 0) {
    delete[] valid;
    return 0;
  }
  // choose n_pts indices into `valid`
  int32_t* pick = new int32_t[n_pts];
  if (n_valid >= n_pts) {
    std::mt19937_64 rng(seed);
    // partial Fisher-Yates over the first n_pts slots
    for (int i = 0; i < n_pts; ++i) {
      std::uniform_int_distribution<int> dist(i, n_valid - 1);
      const int j = dist(rng);
      std::swap(valid[i], valid[j]);
      pick[i] = i;
    }
    for (int i = 0; i < n_pts; ++i) pick[i] = valid[i];
  } else {
    for (int i = 0; i < n_pts; ++i) pick[i] = valid[i % n_valid];
  }
  for (int i = 0; i < n_pts; ++i) {
    const int p = pick[i];
    const float z = roi_depth[p];
    out_pts[3 * i + 0] = (coord_x[p] - cx) * z / fx;
    out_pts[3 * i + 1] = (coord_y[p] - cy) * z / fy;
    out_pts[3 * i + 2] = z;
    out_rows[i] = p / w;
    out_cols[i] = p % w;
  }
  delete[] pick;
  delete[] valid;
  return n_valid;
}

}  // extern "C"
