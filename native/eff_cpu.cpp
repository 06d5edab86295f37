// Native CPU backend for efficient_features_tpu.
//
// Plays the role of the reference's C++ CPU module modules/efficient_features
// (bit-compatible CPU implementations used for parity testing and CPU-only
// deployments).  Semantics follow efficient_features_tpu/utils/semantics.py
// exactly: integer FAST-9, integer box sums for BAD, and the full-f32
// bilinear warp for HashSIFT, so outputs match the NumPy oracle and the TPU
// kernels to IEEE-rounding-order level.
//
// Learned constants (BAD boxes/thresholds, HashSIFT projection) are passed in
// from Python (loaded from the .npz assets) — no baked-in tables.
//
// Build: make -C native   (produces libeff_cpu.so; loaded via ctypes)
#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

namespace {

constexpr float kDeg2Rad = 0.017453292519943295f;
constexpr float kMargin = 1.75f;

// FAST-9 circle in circular bit order (cuda_fast.cu byte packing)
const int kCircle[16][2] = {
    {3, 0},  {3, 1},   {2, 2},   {1, 3},  {0, 3},  {-1, 3}, {-2, 2}, {-3, 1},
    {-3, 0}, {-3, -1}, {-2, -2}, {-1, -3}, {0, -3}, {1, -3}, {2, -2}, {3, -1}};

inline bool any_run9(uint32_t m) {
  uint32_t acc = m;
  for (int s = 1; s < 9; ++s) {
    acc &= ((m >> s) | (m << (16 - s))) & 0xFFFFu;
  }
  return acc != 0;
}

struct Affine {
  float s, cost, sint, m02, m12;
};

// getAffineTransform scalars (cuda_hash_sift.cu:136-155), s folded in
inline Affine affine_scalars(float kx, float ky, float ksize, float kang,
                             float scale) {
  Affine a;
  a.s = scale * ksize / 32.0f;
  const float theta = kang * kDeg2Rad;
  const float c = (kang >= 0) ? std::cos(theta) : 1.0f;
  const float sn = (kang >= 0) ? std::sin(theta) : 0.0f;
  a.cost = c * a.s;
  a.sint = sn * a.s;
  a.m02 = (-a.cost + a.sint) * 16.0f + kx;
  a.m12 = (-a.sint - a.cost) * 16.0f + ky;
  return a;
}

inline int rnd_trunc(float v) { return static_cast<int>(v + 0.5f); }

}  // namespace

extern "C" {

// Dense FAST-9 corner mask (domain [3, dim-3); caller applies border masks).
void eff_fast_mask(const uint8_t* img, int h, int w, int threshold,
                   uint8_t* out) {
  std::memset(out, 0, static_cast<size_t>(h) * w);
  for (int y = 3; y < h - 3; ++y) {
    for (int x = 3; x < w - 3; ++x) {
      const int v = img[y * w + x];
      const int hi = v + threshold;
      const int lo = v - threshold;
      uint32_t brighter = 0, darker = 0;
      for (int b = 0; b < 16; ++b) {
        const int p = img[(y + kCircle[b][0]) * w + x + kCircle[b][1]];
        brighter |= static_cast<uint32_t>(p > hi) << b;
        darker |= static_cast<uint32_t>(p < lo) << b;
      }
      out[y * w + x] = any_run9(brighter) || any_run9(darker);
    }
  }
}

// (h+1)x(w+1) int32 integral, zero top/left, wrapping overflow
void eff_integral(const uint8_t* img, int h, int w, int32_t* out) {
  const int W = w + 1;
  std::memset(out, 0, sizeof(int32_t) * W);
  for (int y = 0; y < h; ++y) {
    out[(y + 1) * W] = 0;
    int32_t row = 0;
    for (int x = 0; x < w; ++x) {
      row += img[y * w + x];
      out[(y + 1) * W + x + 1] = out[y * W + x + 1] + row;
    }
  }
}

// BAD descriptors (cuda_bad.cu semantics; see cpu/descriptors.py)
void eff_bad(const uint8_t* img, int h, int w, const int32_t* integral,
             const float* kps_xysa, int n, float scale_factor,
             const int32_t* boxes /* nbits x 5 */, const float* thresholds,
             int nbits, uint8_t* out /* n x nbits/8 */) {
  const int fw = w + 1, fh = h + 1;
  const int nbytes = nbits / 8;
  for (int i = 0; i < n; ++i) {
    const float kx = kps_xysa[4 * i], ky = kps_xysa[4 * i + 1];
    const float ksize = kps_xysa[4 * i + 2], kang = kps_xysa[4 * i + 3];
    const Affine A = affine_scalars(kx, ky, ksize, kang, scale_factor);

    const float sb = scale_factor * ksize / 64.0f;
    const float bw = 32.0f * sb * kMargin;
    const bool in_border = (kx < bw) || (kx + bw >= static_cast<float>(w)) ||
                           (ky < bw) || (ky + bw >= static_cast<float>(h));

    uint8_t* dst = out + static_cast<size_t>(i) * nbytes;
    std::memset(dst, 0, nbytes);
    for (int b = 0; b < nbits; ++b) {
      const float x1 = static_cast<float>(boxes[5 * b + 0]);
      const float x2 = static_cast<float>(boxes[5 * b + 1]);
      const float y1 = static_cast<float>(boxes[5 * b + 2]);
      const float y2 = static_cast<float>(boxes[5 * b + 3]);
      const float br = static_cast<float>(boxes[5 * b + 4]);
      const int tx1 = rnd_trunc(A.cost * x1 - A.sint * y1 + A.m02);
      const int ty1 = rnd_trunc(A.sint * x1 + A.cost * y1 + A.m12);
      const int tx2 = rnd_trunc(A.cost * x2 - A.sint * y2 + A.m02);
      const int ty2 = rnd_trunc(A.sint * x2 + A.cost * y2 + A.m12);
      const int tbr = rnd_trunc(A.s * br);

      bool bit;
      if (in_border) {
        // division-free cross-multiplied compare (TPU f32 division is a
        // reciprocal approximation; all backends use this exact-int form)
        auto box_sum_area = [&](int cx, int cy, int64_t* area) {
          const int bx1 = std::clamp(cx - tbr, 0, fw - 2);
          const int by1 = std::clamp(cy - tbr, 0, fh - 2);
          const int bx2 = std::clamp(cx + tbr + 1, 1, fw - 1);
          const int by2 = std::clamp(cy + tbr + 1, 1, fh - 1);
          *area = static_cast<int64_t>(by2 - by1) * (bx2 - bx1);
          return static_cast<int64_t>(
              integral[by1 * fw + bx1] + integral[by2 * fw + bx2] -
              integral[by1 * fw + bx2] - integral[by2 * fw + bx1]);
        };
        int64_t a1, a2;
        const int64_t s1 = box_sum_area(tx1, ty1, &a1);
        const int64_t s2 = box_sum_area(tx2, ty2, &a2);
        const float a1f = static_cast<float>(a1), a2f = static_cast<float>(a2);
        if (a1f * a2f < 4194304.0f) {  // a1*a2 < 2^22: int products exact
          bit = static_cast<float>(s1 * a2 - s2 * a1) <=
                thresholds[b] * static_cast<float>(a1 * a2);
        } else {
          // large boxes: 12-significant-bit truncated operands make every
          // f32 product exact (matches ops/bad.py _trunc12 bit-for-bit; TPU
          // has no int64, so the contract uses this branch there too)
          auto trunc12 = [](float v) {
            uint32_t u;
            std::memcpy(&u, &v, 4);
            u &= ~0xFFFu;
            std::memcpy(&v, &u, 4);
            return v;
          };
          const float s1t = trunc12(static_cast<float>(s1));
          const float s2t = trunc12(static_cast<float>(s2));
          const float a1t = trunc12(a1f), a2t = trunc12(a2f);
          bit = (s1t * a2t - s2t * a1t) <= thresholds[b] * (a1t * a2t);
        }
      } else {
        auto box_sum = [&](int cx, int cy) {
          const int bx1 = cx - tbr, by1 = cy - tbr;
          const int bx2 = cx + tbr + 1, by2 = cy + tbr + 1;
          return integral[by1 * fw + bx1] + integral[by2 * fw + bx2] -
                 integral[by1 * fw + bx2] - integral[by2 * fw + bx1];
        };
        const int32_t resp = box_sum(tx1, ty1) - box_sum(tx2, ty2);
        const float side = static_cast<float>(1 + 2 * tbr);
        bit = static_cast<float>(resp) <= thresholds[b] * (side * side);
      }
      dst[b / 8] |= static_cast<uint8_t>(bit) << (7 - b % 8);
    }
  }
}

// HashSIFT warped patches, full-f32 bilinear (see
// cpu/descriptors.py warp_patches) — (n, 32, 32) u8 out
void eff_warp_patches(const uint8_t* img, int h, int w,
                      const float* kps_xysa, int n, float cropping_scale,
                      uint8_t* out) {
  for (int i = 0; i < n; ++i) {
    const Affine A = affine_scalars(kps_xysa[4 * i], kps_xysa[4 * i + 1],
                                    kps_xysa[4 * i + 2], kps_xysa[4 * i + 3],
                                    cropping_scale);
    uint8_t* patch = out + static_cast<size_t>(i) * 1024;
    for (int py = 0; py < 32; ++py) {
      for (int px = 0; px < 32; ++px) {
        const float u = A.cost * px - A.sint * py + A.m02;
        const float v = A.sint * px + A.cost * py + A.m12;
        const int ui = static_cast<int>(std::floor(u));
        const int vi = static_cast<int>(std::floor(v));
        uint8_t val = 0;
        if (ui >= 0 && ui + 1 < w && vi >= 0 && vi + 1 < h) {
          const float du = u - static_cast<float>(ui);
          const float dv = v - static_cast<float>(vi);
          const float p00 = img[vi * w + ui], p01 = img[vi * w + ui + 1];
          const float p10 = img[(vi + 1) * w + ui];
          const float p11 = img[(vi + 1) * w + ui + 1];
          const float z_top = (1.0f - du) * p00 + du * p01;
          const float z_bot = (1.0f - du) * p10 + du * p11;
          const float t2 = (1.0f - dv) * z_top + dv * z_bot;
          val = static_cast<uint8_t>(
              std::min(static_cast<int>(t2 + 0.5f), 255));
        }
        patch[py * 32 + px] = val;
      }
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// HashSIFT (full native path): patch SIFT responses + hash projection
// (mirrors cpu/descriptors.py patch_sift_responses / hash_sift_descriptors)
// ---------------------------------------------------------------------------
extern "C" {

// (n, 32, 32) u8 patches -> (n, 129) float responses [1, d0..d127]
void eff_patch_sift_responses(const uint8_t* patches, int n, float* out) {
  constexpr int R_BINS = 4, C_BINS = 4, ORI_BINS = 8;
  constexpr float kSclFctr = 3.0f, kKpScale = 1.0f / 6.0f;
  constexpr float kMagTh = 0.2f, kIntFactor = 512.0f;
  const float kp_radius = kKpScale * 32.0f * 0.5f;
  const float kernel_sigma = 0.5f * C_BINS * kSclFctr * kp_radius;
  const float dist_scale = -1.0f / (2.0f * kernel_sigma * kernel_sigma);
  const float scale_rc = 1.0f / (kSclFctr * kp_radius);
  const float scale_o = ORI_BINS / 6.283185307179586f;

  for (int i = 0; i < n; ++i) {
    const uint8_t* p = patches + static_cast<size_t>(i) * 1024;
    float hist[R_BINS + 2][C_BINS + 2][ORI_BINS + 2] = {};
    for (int y = 1; y < 31; ++y) {
      for (int x = 1; x < 31; ++x) {
        const float mag_scale = std::exp(
            dist_scale * (static_cast<float>((x - 16) * (x - 16)) +
                          static_cast<float>((y - 16) * (y - 16))));
        const float dx = static_cast<float>(p[y * 32 + x + 1]) -
                         static_cast<float>(p[y * 32 + x - 1]);
        const float dy = static_cast<float>(p[(y - 1) * 32 + x]) -
                         static_cast<float>(p[(y + 1) * 32 + x]);
        const float mag = mag_scale * std::sqrt(dx * dx + dy * dy);
        const float ori = std::atan2(dy, dx);
        const float rbin = scale_rc * (y - 16.0f) + 1.5f;
        const float cbin = scale_rc * (x - 16.0f) + 1.5f;
        const int ri = static_cast<int>(std::floor(rbin));
        const float rf = rbin - ri;
        const int ci = static_cast<int>(std::floor(cbin));
        const float cf = cbin - ci;
        const float ob = scale_o * ori;
        int oi = static_cast<int>(std::floor(ob));
        const float of = ob - oi;
        if (oi < 0) oi += ORI_BINS;
        if (oi >= ORI_BINS) oi -= ORI_BINS;
        const float v1 = rf * mag, v0 = mag - v1;
        const float v01 = cf * v0, v00 = v0 - v01;
        const float v11 = cf * v1, v10 = v1 - v11;
        const float vals[4] = {v00, v01, v10, v11};
        const int drs[4] = {0, 0, 1, 1};
        const int dcs[4] = {0, 1, 0, 1};
        for (int k = 0; k < 4; ++k) {
          const float vh = of * vals[k];
          const float vl = vals[k] - vh;
          hist[ri + 1 + drs[k]][ci + 1 + dcs[k]][oi] += vl;
          hist[ri + 1 + drs[k]][ci + 1 + dcs[k]][oi + 1] += vh;
        }
      }
    }
    float desc[128];
    for (int r = 0; r < R_BINS; ++r) {
      for (int c = 0; c < C_BINS; ++c) {
        float* hp = hist[r + 1][c + 1];
        hp[0] += hp[ORI_BINS];
        hp[1] += hp[ORI_BINS + 1];
        for (int k = 0; k < ORI_BINS; ++k)
          desc[(r * R_BINS + c) * ORI_BINS + k] = hp[k];
      }
    }
    for (int pass = 0; pass < 2; ++pass) {
      float sum = 0.0f;
      for (float v : desc) sum += v * v;
      const float scale = 1.0f / std::max(std::sqrt(sum), 1.1920929e-07f);
      for (float& v : desc) v *= scale;
      if (pass == 0)
        for (float& v : desc) v = std::min(v, kMagTh);
    }
    float* row = out + static_cast<size_t>(i) * 129;
    row[0] = 1.0f;
    for (int k = 0; k < 128; ++k) {
      const float v = kIntFactor * desc[k];
      row[k + 1] = std::min(std::max(std::floor(v + 0.5f), 0.0f), 255.0f);
    }
  }
}

// responses (n, 129) @ B^T (nbits, 129) -> sign bits, MSB-first bytes
void eff_hash_project(const float* responses, int n, const float* b_matrix,
                      int nbits, uint8_t* out) {
  const int nbytes = nbits / 8;
  for (int i = 0; i < n; ++i) {
    const float* r = responses + static_cast<size_t>(i) * 129;
    uint8_t* dst = out + static_cast<size_t>(i) * nbytes;
    std::memset(dst, 0, nbytes);
    for (int b = 0; b < nbits; ++b) {
      const float* w = b_matrix + static_cast<size_t>(b) * 129;
      float acc = 0.0f;
      for (int k = 0; k < 129; ++k) acc += r[k] * w[k];
      dst[b / 8] |= static_cast<uint8_t>(acc > 0.0f) << (7 - b % 8);
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Native full detector (multi-scale FAST+Harris+NMS+topk+IC-angle), the
// C++ deployment path for the complete detect pipeline.  Semantics are
// bit-identical to cpu/reference.py detect(): fixed-point resize pyramid,
// FMA-immune quantized Harris, ties-co-survive radius NMS,
// (response desc, index asc) selection, exact integer IC moments.  The
// reference's own CPU module (modules/efficient_features) has no detector
// at all; this exceeds it.
// ---------------------------------------------------------------------------
#include <vector>
#include <cfenv>

namespace {

constexpr int kResizeBits = 11;   // semantics.RESIZE_BITS
constexpr int kHalfPatch = 15;    // semantics.HALF_PATCH_SIZE

// semantics.resize_axis_coeffs: half-pixel centers, 11-bit quantized weight
// (numpy round = half-even -> rint under the default FE_TONEAREST).
inline void resize_axis_coeffs(int dst_n, int src_n, std::vector<int>& i0,
                               std::vector<int>& i1, std::vector<int>& w1) {
  i0.resize(dst_n);
  i1.resize(dst_n);
  w1.resize(dst_n);
  const double ratio = static_cast<double>(src_n) / dst_n;
  for (int i = 0; i < dst_n; ++i) {
    const double x = (i + 0.5) * ratio - 0.5;
    const double f0 = std::floor(x);
    const double f = x - f0;
    long q = std::lrint(f * (1 << kResizeBits));
    if (q < 0) q = 0;
    if (q > (1 << kResizeBits)) q = 1 << kResizeBits;
    int a = static_cast<int>(f0);
    int b = a + 1;
    if (a < 0) a = 0;
    if (a > src_n - 1) a = src_n - 1;
    if (b < 0) b = 0;
    if (b > src_n - 1) b = src_n - 1;
    i0[i] = a;
    i1[i] = b;
    w1[i] = static_cast<int>(q);
  }
}

void resize_u8_native(const std::vector<uint8_t>& src, int sh, int sw,
                      std::vector<uint8_t>& dst, int h, int w) {
  std::vector<int> x0, x1, wx, y0, y1, wy;
  resize_axis_coeffs(w, sw, x0, x1, wx);
  resize_axis_coeffs(h, sh, y0, y1, wy);
  const int one = 1 << kResizeBits;
  const int rnd = 1 << (2 * kResizeBits - 1);
  std::vector<int32_t> hpass(static_cast<size_t>(sh) * w);
  for (int r = 0; r < sh; ++r) {
    const uint8_t* row = src.data() + static_cast<size_t>(r) * sw;
    int32_t* hp = hpass.data() + static_cast<size_t>(r) * w;
    for (int c = 0; c < w; ++c) {
      hp[c] = row[x0[c]] * (one - wx[c]) + row[x1[c]] * wx[c];
    }
  }
  dst.assign(static_cast<size_t>(h) * w, 0);
  for (int r = 0; r < h; ++r) {
    const int32_t* ra = hpass.data() + static_cast<size_t>(y0[r]) * w;
    const int32_t* rb = hpass.data() + static_cast<size_t>(y1[r]) * w;
    uint8_t* out = dst.data() + static_cast<size_t>(r) * w;
    for (int c = 0; c < w; ++c) {
      const int32_t acc = ra[c] * (one - wy[r]) + rb[c] * wy[r];
      out[c] = static_cast<uint8_t>((acc + rnd) >> (2 * kResizeBits));
    }
  }
}

inline float trunc_mantissa(float v, int drop_bits) {
  uint32_t u;
  std::memcpy(&u, &v, 4);
  u &= ~((1u << drop_bits) - 1u);
  std::memcpy(&v, &u, 4);
  return v;
}

// Dense Harris response (valid where the 9x9 support is in-bounds; the
// detector's 15px border mask guarantees that).
void harris_native(const std::vector<uint8_t>& img, int h, int w,
                   std::vector<float>& resp) {
  const float hs = static_cast<float>(1.0 / (4 * 7 * 255.0));
  const float s2 = hs * hs;
  const float k = 3.0f / 64.0f;
  std::vector<int32_t> gx(static_cast<size_t>(h) * w, 0);
  std::vector<int32_t> gy(static_cast<size_t>(h) * w, 0);
  auto at = [&](int y, int x) -> int {
    if (y < 0 || y >= h || x < 0 || x >= w) return 0;
    return img[static_cast<size_t>(y) * w + x];
  };
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      // _shift2d(a, dy, dx)[y, x] = a[y+dy, x+dx]
      gx[static_cast<size_t>(y) * w + x] =
          (at(y + 1, x + 1) + 2 * at(y, x + 1) + at(y - 1, x + 1)) -
          (at(y + 1, x - 1) + 2 * at(y, x - 1) + at(y - 1, x - 1));
      gy[static_cast<size_t>(y) * w + x] =
          (at(y + 1, x - 1) + 2 * at(y + 1, x) + at(y + 1, x + 1)) -
          (at(y - 1, x - 1) + 2 * at(y - 1, x) + at(y - 1, x + 1));
    }
  }
  resp.assign(static_cast<size_t>(h) * w, 0.0f);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      int64_t sxx = 0, sxy = 0, syy = 0;
      for (int dy = -3; dy <= 3; ++dy) {
        for (int dx = -3; dx <= 3; ++dx) {
          const int yy = y + dy, xx = x + dx;
          if (yy < 0 || yy >= h || xx < 0 || xx >= w) continue;
          const int64_t a = gx[static_cast<size_t>(yy) * w + xx];
          const int64_t b = gy[static_cast<size_t>(yy) * w + xx];
          sxx += a * a;
          sxy += a * b;
          syy += b * b;
        }
      }
      const float fxx = trunc_mantissa(s2 * static_cast<float>(sxx), 12);
      const float fxy = trunc_mantissa(s2 * static_cast<float>(sxy), 12);
      const float fyy = trunc_mantissa(s2 * static_cast<float>(syy), 12);
      const float tr = trunc_mantissa(fxx + fyy, 13);
      resp[static_cast<size_t>(y) * w + x] =
          (fxx * fyy - fxy * fxy) - k * (tr * tr);
    }
  }
}

}  // namespace

extern "C" {

// Full multi-scale detect.  level_hw: (nlevels, 2) int32 pyramid shapes
// (level 0 = input); scales/quotas per level from utils/semantics; umax:
// 17-entry IC table.  Outputs are level-major with per-level counts;
// capacity of the output arrays must be >= sum(quotas).
void eff_detect(const uint8_t* img, int h, int w, const int32_t* level_hw,
                const float* scales, const int32_t* quotas, int nlevels,
                int first_level, int fast_threshold, int nonmax_radius,
                const int32_t* umax, float* out_x, float* out_y,
                float* out_resp, float* out_ang, int32_t* out_oct,
                float* out_size, int32_t* counts) {
  std::vector<std::vector<uint8_t>> levels(nlevels);
  levels[0].assign(img, img + static_cast<size_t>(h) * w);
  for (int s = 1; s < nlevels; ++s) {
    resize_u8_native(levels[s - 1], level_hw[2 * (s - 1)],
                     level_hw[2 * (s - 1) + 1], levels[s], level_hw[2 * s],
                     level_hw[2 * s + 1]);
  }

  const int r2 = static_cast<int>(
      std::ceil(static_cast<double>(nonmax_radius) * nonmax_radius));
  size_t outpos = 0;
  for (int s = 0; s < nlevels; ++s) {
    counts[s] = 0;
    if (s < first_level) continue;
    const int lh = level_hw[2 * s], lw = level_hw[2 * s + 1];
    const std::vector<uint8_t>& lv = levels[s];
    std::vector<uint8_t> corner(static_cast<size_t>(lh) * lw, 0);
    eff_fast_mask(lv.data(), lh, lw, fast_threshold, corner.data());
    // border mask [15, dim-15)
    if (lh <= 2 * kHalfPatch || lw <= 2 * kHalfPatch) continue;
    std::vector<float> resp;
    harris_native(lv, lh, lw, resp);

    // radius NMS (ties co-survive) + candidate collection
    struct Cand { float r; int64_t idx; };
    std::vector<Cand> cands;
    for (int y = kHalfPatch; y < lh - kHalfPatch; ++y) {
      for (int x = kHalfPatch; x < lw - kHalfPatch; ++x) {
        if (!corner[static_cast<size_t>(y) * lw + x]) continue;
        const float rv = resp[static_cast<size_t>(y) * lw + x];
        bool keep = true;
        for (int dy = -nonmax_radius; keep && dy <= nonmax_radius; ++dy) {
          const int yy = y + dy;
          if (yy < kHalfPatch || yy >= lh - kHalfPatch) continue;
          for (int dx = -nonmax_radius; dx <= nonmax_radius; ++dx) {
            const int d2 = dy * dy + dx * dx;
            if (d2 == 0 || d2 >= r2) continue;
            const int xx = x + dx;
            if (xx < kHalfPatch || xx >= lw - kHalfPatch) continue;
            if (!corner[static_cast<size_t>(yy) * lw + xx]) continue;
            if (resp[static_cast<size_t>(yy) * lw + xx] > rv) {
              keep = false;
              break;
            }
          }
        }
        if (keep) {
          cands.push_back({rv, static_cast<int64_t>(y) * lw + x});
        }
      }
    }
    std::sort(cands.begin(), cands.end(), [](const Cand& a, const Cand& b) {
      if (a.r != b.r) return a.r > b.r;
      return a.idx < b.idx;
    });
    const int q = quotas[s];
    const int n = static_cast<int>(
        std::min<size_t>(cands.size(), static_cast<size_t>(q)));
    const float sc = scales[s];
    for (int i = 0; i < n; ++i) {
      const int y = static_cast<int>(cands[i].idx / lw);
      const int x = static_cast<int>(cands[i].idx % lw);
      // IC angle: exact integer moments over the umax disc
      int64_t m10 = 0, m01 = 0;
      for (int dy = -kHalfPatch; dy <= kHalfPatch; ++dy) {
        const int d = umax[dy < 0 ? -dy : dy];
        for (int dx = -d; dx <= d; ++dx) {
          const int64_t v = lv[static_cast<size_t>(y + dy) * lw + (x + dx)];
          m10 += v * dx;
          m01 += v * dy;
        }
      }
      float ang = std::atan2(static_cast<float>(m01),
                             static_cast<float>(m10));
      if (ang < 0) ang += 6.2831853071795864769f;
      ang *= 57.29577951308232f;
      // scalePoints: short(trunc(scale*x + 0.5)); go through int32 so the
      // int16 narrowing has defined wraparound matching numpy's cast (a
      // direct float->int16 conversion is UB for values >= 32768)
      out_x[outpos] = static_cast<float>(static_cast<int16_t>(
          static_cast<int32_t>(sc * static_cast<float>(x) + 0.5f)));
      out_y[outpos] = static_cast<float>(static_cast<int16_t>(
          static_cast<int32_t>(sc * static_cast<float>(y) + 0.5f)));
      out_resp[outpos] = cands[i].r;
      out_ang[outpos] = ang;
      out_oct[outpos] = s;
      out_size[outpos] = sc * 31.0f;
      ++outpos;
    }
    counts[s] = n;
  }
}

}  // extern "C"
