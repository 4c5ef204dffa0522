// Native block-quantization codec (quantize-on-load hot path).
//
// C++ implementation of the same block formats as
// inferflow_tpu/quant/codec_np.py (the numpy ground truth mirroring the
// reference's src/common/quantization.h formulas).  Used by the loader's
// quantize-and-upload pipeline — the TPU analog of the reference's
// DeviceTensorBuilder worker threads (src/tensor/device_tensor_builder.cu).
//
// Layout: input is a float32 (K, N) array, blocks along K; outputs are
// plane-separated packed arrays (see quant/formats.py) plus fp16-encoded
// (uint16) or f32 (u8-meta formats) scale/base planes of shape (K/block, N).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread quant_codec.cc -o libquantcodec.so

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <thread>
#include <vector>

namespace {

// ---- fp16 encode/decode (round-to-nearest-even, matches numpy) ----------
static inline uint16_t f32_to_f16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  uint32_t sign = (x >> 16) & 0x8000u;
  int32_t exp = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
  uint32_t mant = x & 0x7FFFFFu;
  if (exp >= 31) return (uint16_t)(sign | 0x7C00u);           // inf
  if (exp <= 0) {                                             // subnormal
    if (exp < -10) return (uint16_t)sign;
    mant |= 0x800000u;
    int shift = 14 - exp;
    uint32_t q = mant >> shift;
    uint32_t rem = mant & ((1u << shift) - 1);
    uint32_t half = 1u << (shift - 1);
    if (rem > half || (rem == half && (q & 1))) q++;
    return (uint16_t)(sign | q);
  }
  uint32_t q = mant >> 13;
  uint32_t rem = mant & 0x1FFFu;
  if (rem > 0x1000u || (rem == 0x1000u && (q & 1))) {
    q++;
    if (q == 0x400u) { q = 0; exp++; if (exp >= 31) return (uint16_t)(sign | 0x7C00u); }
  }
  return (uint16_t)(sign | ((uint32_t)exp << 10) | q);
}

static inline float f16_to_f32(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t mant = h & 0x3FFu;
  uint32_t out;
  if (exp == 0) {
    if (mant == 0) { out = sign; }
    else {
      exp = 127 - 15 + 1;
      while (!(mant & 0x400u)) { mant <<= 1; exp--; }
      mant &= 0x3FFu;
      out = sign | (exp << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    out = sign | 0x7F800000u | (mant << 13);
  } else {
    out = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &out, 4);
  return f;
}

struct FmtInfo {
  int block;
  float scale_div;
  int max_code;
  int rounding;   // 0 half_up, 1 trunc_eps, 2 round-half-away
  int base_kind;  // 0 min, 1 mid, 2 zero(symmetric)
  int meta;       // 0 f16, 1 u8-encoded(f32 out)
  bool pair_base11;
  bool adjust_base;
  // plane bit widths (0 = absent): data, data_m, data_h
  int bits_data, bits_m, bits_h;
  bool split_half;  // Q5_B32T1 nibble layout
};

// format ids must match codec_native.py FMT_IDS
static const FmtInfo kFormats[] = {
    /*0 Q8_B32T1 */ {32, 255.f, 255, 0, 0, 0, false, false, 8, 0, 0, false},
    /*1 Q8_B32T2 */ {32, 127.f, 127, 2, 2, 0, false, false, 8, 0, 0, false},
    /*2 Q6_B64T1 */ {64, 62.f, 63, 0, 0, 0, false, false, 4, 0, 2, false},
    /*3 Q5_B64T1 */ {64, 30.f, 31, 0, 0, 0, false, false, 4, 0, 1, false},
    /*4 Q5_B32T1 */ {32, 31.f, 31, 0, 0, 0, false, false, 4, 0, 1, true},
    /*5 Q4_B64T1 */ {64, 14.f, 15, 0, 0, 0, false, false, 4, 0, 0, false},
    /*6 Q4_B32T1A*/ {32, 15.f, 15, 0, 0, 0, false, false, 4, 0, 0, false},
    /*7 Q4_B32T1B*/ {32, 16.f, 15, 1, 1, 0, false, false, 4, 0, 0, false},
    /*8 Q4_B32T2 */ {32, 15.f, 15, 0, 0, 1, false, true, 4, 0, 0, false},
    /*9 Q4_B16   */ {16, 15.f, 15, 0, 0, 1, false, true, 4, 0, 0, false},
    /*10 Q3H_B64T1*/{64, 10.f, 10, 0, 0, 0, true, false, 4, 2, 1, false},
    /*11 Q3_B32T1A*/{32, 7.f, 7, 0, 0, 0, false, false, 2, 0, 1, false},
    /*12 Q3_B32T1B*/{32, 8.f, 7, 1, 1, 0, false, false, 2, 0, 1, false},
    /*13 Q2_B32T1A*/{32, 3.f, 3, 0, 0, 0, false, false, 2, 0, 0, false},
    /*14 Q2_B32T1B*/{32, 4.f, 3, 1, 1, 0, false, false, 2, 0, 0, false},
};

// pack one column-block of codes into the planes.
// codes: `block` values (or block/2 pair codes for Q3H).
struct PlaneOut {
  uint8_t* data;
  uint8_t* data_m;
  uint8_t* data_h;
  int64_t stride;  // N (bytes per packed row)
};

static void pack_codes(const FmtInfo& f, const uint32_t* codes, int count,
                       PlaneOut& out, int64_t row0_data, int64_t row0_m,
                       int64_t row0_h, int64_t col) {
  // consecutive layout: byte r of a plane with p values/byte holds values
  // r*p .. r*p+p-1, low bits first.
  auto pack_plane = [&](uint8_t* dst, int64_t row0, int bits, int shift) {
    if (!dst || bits == 0) return;
    int p = 8 / bits;
    int mask = (1 << bits) - 1;
    for (int r = 0; r * p < count; r++) {
      uint8_t byte = 0;
      for (int i = 0; i < p; i++) {
        uint32_t v = (codes[r * p + i] >> shift) & mask;
        byte |= (uint8_t)(v << (i * bits));
      }
      dst[(row0 + r) * out.stride + col] = byte;
    }
  };
  if (f.split_half) {
    // Q5_B32T1: byte i holds value i (low nibble) and i+block/2 (high)
    int half = count / 2;
    for (int i = 0; i < half; i++) {
      uint8_t byte = (uint8_t)((codes[i] & 0xF) | ((codes[half + i] & 0xF) << 4));
      out.data[(row0_data + i) * out.stride + col] = byte;
    }
    pack_plane(out.data_h, row0_h, f.bits_h, 4);
    return;
  }
  pack_plane(out.data, row0_data, f.bits_data, 0);
  pack_plane(out.data_m, row0_m, f.bits_m, f.bits_data);
  pack_plane(out.data_h, row0_h, f.bits_h, f.bits_data + f.bits_m);
}

static void quantize_cols(int fmt_id, const float* x, int64_t K, int64_t N,
                          int64_t col_begin, int64_t col_end,
                          uint8_t* d_data, uint8_t* d_m, uint8_t* d_h,
                          void* d_scale, void* d_base) {
  const FmtInfo& f = kFormats[fmt_id];
  const int64_t nb = K / f.block;
  std::vector<float> vals(f.block);
  std::vector<uint32_t> codes(f.block);

  const int pd = f.bits_data ? 8 / f.bits_data : 1;
  const int pm = f.bits_m ? 8 / f.bits_m : 1;
  const int ph = f.bits_h ? 8 / f.bits_h : 1;
  const int per = f.pair_base11 ? 2 : 1;

  PlaneOut out{d_data, d_m, d_h, N};

  for (int64_t col = col_begin; col < col_end; col++) {
    for (int64_t b = 0; b < nb; b++) {
      const float* px = x + (b * f.block) * N + col;
      float vmin = 1e30f, vmax = -1e30f;
      for (int i = 0; i < f.block; i++) {
        float v = px[(int64_t)i * N];
        vals[i] = v;
        vmin = std::min(vmin, v);
        vmax = std::max(vmax, v);
      }
      float scale, base_q = 0.f, stored_base = 0.f;
      if (f.base_kind == 2) {  // symmetric int8
        float m0 = std::max(std::fabs(vmin), std::fabs(vmax));
        scale = m0 / f.scale_div;
        float inv = scale >= 1e-5f ? 1.0f / scale : 0.0f;
        ((uint16_t*)d_scale)[b * N + col] = f32_to_f16(scale);
        for (int i = 0; i < f.block; i++) {
          float qf = vals[i] * inv;
          float q = std::trunc(qf + std::copysign(0.5f, qf));
          q = std::min(127.f, std::max(-128.f, q));
          codes[i] = ((uint32_t)(int32_t)q) & 0xFF;
        }
        pack_codes(f, codes.data(), f.block, out,
                   b * (f.block / pd), b * (f.block / pm),
                   b * (f.block / ph), col);
        continue;
      }
      base_q = vmin;
      if (f.adjust_base) {
        uint8_t u8 = (uint8_t)((int64_t)std::trunc(vmin * 100.0 + 100.01) & 0xFF);
        base_q = (float)u8 / 100.0f - 1.0f;
      }
      scale = (vmax - base_q) / f.scale_div;
      float inv = scale >= 1e-5f ? 1.0f / scale : 0.0f;
      stored_base = f.base_kind == 1 ? base_q + 0.5f * scale : base_q;
      if (f.meta == 1) {  // u8-encoded, decoded f32 stored
        uint8_t su8 = (uint8_t)std::min(255.f, std::max(0.f, std::trunc(scale * 1000.f + 0.5f)));
        ((float*)d_scale)[b * N + col] = (float)su8 / 1000.0f;
        uint8_t bu8 = (uint8_t)((int64_t)std::trunc(stored_base * 100.0 + 100.5) & 0xFF);
        ((float*)d_base)[b * N + col] = (float)bu8 / 100.0f - 1.0f;
      } else {
        ((uint16_t*)d_scale)[b * N + col] = f32_to_f16(scale);
        ((uint16_t*)d_base)[b * N + col] = f32_to_f16(stored_base);
      }
      for (int i = 0; i < f.block; i++) {
        float qf = (vals[i] - base_q) * inv;
        float q;
        if (f.rounding == 0) q = std::trunc(qf + 0.5f);
        else if (f.rounding == 1) q = std::trunc(qf + 0.0001f);
        else q = std::trunc(qf + std::copysign(0.5f, qf));
        uint32_t qi;
        if (f.pair_base11) {
          q = std::min((float)f.max_code, std::max(0.f, q));
          qi = (uint32_t)q;
        } else {
          // uint32 cast-then-clamp (negatives wrap to max_code)
          qi = q < 0 ? (uint32_t)f.max_code
                     : std::min((uint32_t)q, (uint32_t)f.max_code);
        }
        codes[i] = qi;
      }
      int count = f.block;
      if (f.pair_base11) {
        count = f.block / 2;
        for (int i = 0; i < count; i++)
          codes[i] = codes[2 * i] + 11u * codes[2 * i + 1];
      }
      pack_codes(f, codes.data(), count, out,
                 b * (count / pd), b * (count / pm), b * (count / ph), col);
    }
  }
}

}  // namespace

extern "C" {

// Quantize a float32 (K, N) array, blocks along K.
// Outputs (caller-allocated, plane shapes as in codec_np):
//   data   : (K/per/pd, N) u8     (per=2 for Q3H pair codes)
//   data_m : (K/per/pm, N) u8 or null
//   data_h : (K/per/ph, N) u8 or null
//   scale  : (K/block, N) u16 (f16 bits) or f32 for u8-meta formats
//   base   : (K/block, N) u16/f32 or null (symmetric)
// Returns 0 on success.
int quantize_f32(int fmt_id, const float* x, int64_t K, int64_t N,
                 uint8_t* data, uint8_t* data_m, uint8_t* data_h,
                 void* scale, void* base, int n_threads) {
  if (fmt_id < 0 || fmt_id >= (int)(sizeof(kFormats) / sizeof(kFormats[0])))
    return -1;
  const FmtInfo& f = kFormats[fmt_id];
  if (K % f.block != 0) return -2;
  if (n_threads < 1) n_threads = 1;
  n_threads = std::min<int64_t>(n_threads, N);
  std::vector<std::thread> threads;
  int64_t per = (N + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; t++) {
    int64_t c0 = t * per, c1 = std::min<int64_t>(N, c0 + per);
    if (c0 >= c1) break;
    threads.emplace_back(quantize_cols, fmt_id, x, K, N, c0, c1, data,
                         data_m, data_h, scale, base);
  }
  for (auto& th : threads) th.join();
  return 0;
}

// fp16 (uint16 bits) -> fp32 bulk convert (checkpoint dtype transform).
void f16_to_f32_buf(const uint16_t* src, float* dst, int64_t n) {
  for (int64_t i = 0; i < n; i++) dst[i] = f16_to_f32(src[i]);
}

// bf16 (uint16 bits) -> fp32 bulk convert.
void bf16_to_f32_buf(const uint16_t* src, float* dst, int64_t n) {
  for (int64_t i = 0; i < n; i++) {
    uint32_t u = ((uint32_t)src[i]) << 16;
    std::memcpy(dst + i, &u, 4);
  }
}

}  // extern "C"
