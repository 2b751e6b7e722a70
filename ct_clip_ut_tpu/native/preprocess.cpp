// Fused CT preprocessing: HU transform + spacing resample + clamp/scale +
// center-crop/pad in a single pass over output voxels, multithreaded.
//
// Replaces the reference's torch CPU chain (reference src/utils/preprocess.py
// :84-151), which materializes a full resampled volume before cropping.
// Here every output voxel maps straight back to raw voxel space:
//   out[d, h, w] -> (crop/pad offset) -> resampled index -> half-pixel
//   trilinear sample of the raw volume -> affine HU -> clamp/scale.
// The HU transform is affine, so it commutes with trilinear interpolation;
// clamp happens after sampling, matching the reference order (resample,
// then clamp).
//
// Exact semantics of torch F.interpolate(mode='trilinear',
// align_corners=False): src = (i + 0.5) * in/out - 0.5, clamped to borders.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

struct AxisMap {
  // maps an output index along one axis to a (lo, hi, w) interpolation pair
  // into the raw volume, or marks it padded.
  std::vector<int32_t> lo, hi;
  std::vector<float> w;
  std::vector<uint8_t> pad;
};

// Compose crop/pad (resampled size S -> target T) with the resample
// coordinate transform (raw size R -> resampled size S).
AxisMap build_axis(int raw, int resampled, int target) {
  AxisMap m;
  m.lo.resize(target);
  m.hi.resize(target);
  m.w.resize(target);
  m.pad.resize(target);

  int crop_start = 0, pad_before = 0;
  if (resampled > target) crop_start = (resampled - target) / 2;
  if (resampled < target) pad_before = (target - resampled) / 2;

  const double scale = static_cast<double>(raw) / resampled;
  for (int i = 0; i < target; ++i) {
    const int r = i - pad_before + crop_start;  // index in resampled space
    if (r < 0 || r >= resampled) {
      m.pad[i] = 1;
      m.lo[i] = m.hi[i] = 0;
      m.w[i] = 0.f;
      continue;
    }
    m.pad[i] = 0;
    double src = (r + 0.5) * scale - 0.5;
    src = std::min(std::max(src, 0.0), static_cast<double>(raw - 1));
    const int lo = static_cast<int>(std::floor(src));
    m.lo[i] = lo;
    m.hi[i] = std::min(lo + 1, raw - 1);
    m.w[i] = static_cast<float>(src - lo);
  }
  return m;
}

}  // namespace

extern "C" {

// raw:  C-contiguous float32 [H, W, D] voxels (NIfTI logical order).
// out:  C-contiguous float32 [tD, tH, tW].
// Resampled sizes follow the reference: int(dim * spacing / target_spacing)
// computed on the [D, H, W] permuted volume with spacing (z, xy, xy).
// Returns 0 on success.
int ct_preprocess_fused(const float* raw, int H, int W, int D,
                        float slope, float intercept,
                        float z_spacing, float xy_spacing,
                        float tz_spacing, float txy_spacing,
                        int tH, int tW, int tD,
                        float hu_min, float hu_max, float pad_value,
                        float* out, int num_threads) {
  const int rD = static_cast<int>(D * (z_spacing / tz_spacing));
  const int rH = static_cast<int>(H * (xy_spacing / txy_spacing));
  const int rW = static_cast<int>(W * (xy_spacing / txy_spacing));
  if (rD <= 0 || rH <= 0 || rW <= 0) return 1;

  const AxisMap md = build_axis(D, rD, tD);
  const AxisMap mh = build_axis(H, rH, tH);
  const AxisMap mw = build_axis(W, rW, tW);

  // raw strides for [H, W, D] C-order
  const int64_t sH = static_cast<int64_t>(W) * D;
  const int64_t sW = D;

  const float inv = 1.0f / hu_max;
  const float padded = pad_value;  // already in normalized units (-1)

  auto worker = [&](int d0, int d1) {
    for (int d = d0; d < d1; ++d) {
      float* slab = out + static_cast<int64_t>(d) * tH * tW;
      if (md.pad[d]) {
        std::fill(slab, slab + static_cast<int64_t>(tH) * tW, padded);
        continue;
      }
      const int dlo = md.lo[d], dhi = md.hi[d];
      const float wd = md.w[d];
      for (int h = 0; h < tH; ++h) {
        float* row = slab + static_cast<int64_t>(h) * tW;
        if (mh.pad[h]) {
          std::fill(row, row + tW, padded);
          continue;
        }
        const int hlo = mh.lo[h], hhi = mh.hi[h];
        const float wh = mh.w[h];
        const float* base_ll = raw + hlo * sH;
        const float* base_hl = raw + hhi * sH;
        for (int w = 0; w < tW; ++w) {
          if (mw.pad[w]) {
            row[w] = padded;
            continue;
          }
          const int wlo = mw.lo[w], whi = mw.hi[w];
          const float ww = mw.w[w];
          // 8-corner gather in [H, W, D] layout
          const float v000 = base_ll[wlo * sW + dlo];
          const float v001 = base_ll[wlo * sW + dhi];
          const float v010 = base_ll[whi * sW + dlo];
          const float v011 = base_ll[whi * sW + dhi];
          const float v100 = base_hl[wlo * sW + dlo];
          const float v101 = base_hl[wlo * sW + dhi];
          const float v110 = base_hl[whi * sW + dlo];
          const float v111 = base_hl[whi * sW + dhi];

          const float c00 = v000 + (v001 - v000) * wd;
          const float c01 = v010 + (v011 - v010) * wd;
          const float c10 = v100 + (v101 - v100) * wd;
          const float c11 = v110 + (v111 - v110) * wd;
          const float c0 = c00 + (c01 - c00) * ww;
          const float c1 = c10 + (c11 - c10) * ww;
          float val = c0 + (c1 - c0) * wh;

          val = slope * val + intercept;                      // HU
          val = std::min(std::max(val, hu_min), hu_max) * inv;  // clamp/scale
          row[w] = val;
        }
      }
    }
  };

  const int nt = std::max(1, num_threads);
  std::vector<std::thread> threads;
  const int per = (tD + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int d0 = t * per;
    const int d1 = std::min(tD, d0 + per);
    if (d0 >= d1) break;
    threads.emplace_back(worker, d0, d1);
  }
  for (auto& th : threads) th.join();
  return 0;
}

// Simple trilinear resize (torch align_corners=False), used by the
// ctgenerate path: raw [H, W, D] -> out [oD, oH, oW] with HU+clamp fused.
int ct_resize_fused(const float* raw, int H, int W, int D,
                    float slope, float intercept,
                    int oD, int oH, int oW,
                    float hu_min, float hu_max,
                    float* out, int num_threads) {
  // clamp happens BEFORE this resize in the reference ctgenerate order?
  // No: reference clamps after HU then interpolates (preprocess.py:135-150:
  // clamp/scale happens before the ctgenerate interpolate). So here:
  // sample(clamped HU)/1000 would differ from clamp-then-sample only via
  // the nonlinearity at +-1000; we therefore clamp per-corner BEFORE lerp.
  const AxisMap md = build_axis(D, D, D);  // identity helper not used; build below
  (void)md;

  const int64_t sH = static_cast<int64_t>(W) * D;
  const int64_t sW = D;
  const float inv = 1.0f / hu_max;

  auto axis = [](int raw_n, int out_n, std::vector<int>& lo,
                 std::vector<int>& hi, std::vector<float>& wgt) {
    lo.resize(out_n); hi.resize(out_n); wgt.resize(out_n);
    const double scale = static_cast<double>(raw_n) / out_n;
    for (int i = 0; i < out_n; ++i) {
      double src = (i + 0.5) * scale - 0.5;
      src = std::min(std::max(src, 0.0), static_cast<double>(raw_n - 1));
      lo[i] = static_cast<int>(std::floor(src));
      hi[i] = std::min(lo[i] + 1, raw_n - 1);
      wgt[i] = static_cast<float>(src - lo[i]);
    }
  };
  std::vector<int> dlo, dhi, hlo, hhi, wlo, whi;
  std::vector<float> dw, hw, ww;
  axis(D, oD, dlo, dhi, dw);
  axis(H, oH, hlo, hhi, hw);
  axis(W, oW, wlo, whi, ww);

  auto hu = [&](float v) {
    v = slope * v + intercept;
    return std::min(std::max(v, hu_min), hu_max) * inv;
  };

  auto worker = [&](int d0, int d1) {
    for (int d = d0; d < d1; ++d) {
      float* slab = out + static_cast<int64_t>(d) * oH * oW;
      for (int h = 0; h < oH; ++h) {
        float* row = slab + static_cast<int64_t>(h) * oW;
        for (int w = 0; w < oW; ++w) {
          const float v000 = hu(raw[hlo[h] * sH + wlo[w] * sW + dlo[d]]);
          const float v001 = hu(raw[hlo[h] * sH + wlo[w] * sW + dhi[d]]);
          const float v010 = hu(raw[hlo[h] * sH + whi[w] * sW + dlo[d]]);
          const float v011 = hu(raw[hlo[h] * sH + whi[w] * sW + dhi[d]]);
          const float v100 = hu(raw[hhi[h] * sH + wlo[w] * sW + dlo[d]]);
          const float v101 = hu(raw[hhi[h] * sH + wlo[w] * sW + dhi[d]]);
          const float v110 = hu(raw[hhi[h] * sH + whi[w] * sW + dlo[d]]);
          const float v111 = hu(raw[hhi[h] * sH + whi[w] * sW + dhi[d]]);
          const float c00 = v000 + (v001 - v000) * dw[d];
          const float c01 = v010 + (v011 - v010) * dw[d];
          const float c10 = v100 + (v101 - v100) * dw[d];
          const float c11 = v110 + (v111 - v110) * dw[d];
          const float c0 = c00 + (c01 - c00) * ww[w];
          const float c1 = c10 + (c11 - c10) * ww[w];
          row[w] = c0 + (c1 - c0) * hw[h];
        }
      }
    }
  };

  const int nt = std::max(1, num_threads);
  std::vector<std::thread> threads;
  const int per = (oD + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int d0 = t * per;
    const int d1 = std::min(oD, d0 + per);
    if (d0 >= d1) break;
    threads.emplace_back(worker, d0, d1);
  }
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"
