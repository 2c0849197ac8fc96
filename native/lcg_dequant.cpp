// Native GGUF block-dequantization library.
//
// TPU-native counterpart of the reference's ggml CPU dequant rows
// (ggml submodule, dequantize_row_* family; layouts per
// gguf-py/gguf/quants.py) — used on the HOST side of this framework:
// model load streams quantized tensors from the memmap and dequantizes
// them into f32/bf16 staging buffers before jax.device_put.  numpy does
// this single-threaded; this library does it with a thread pool at
// memory-bandwidth speed.  Python binds via ctypes (no pybind11 in the
// image); gguf/quants.py falls back to numpy when the .so is absent.
//
// Build: g++ -O3 -march=native -fPIC -shared -pthread -o liblcg_dequant.so lcg_dequant.cpp

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ggml type ids (gguf constants)
enum GgmlType : int32_t {
  T_F32 = 0, T_F16 = 1, T_Q4_0 = 2, T_Q4_1 = 3, T_Q5_0 = 6, T_Q5_1 = 7,
  T_Q8_0 = 8, T_Q2_K = 10, T_Q4_K = 12, T_Q5_K = 13, T_Q6_K = 14,
  T_BF16 = 30, T_MXFP4 = 39,
};

inline float f16_to_f32(uint16_t h) {
  // IEEE half -> float (bit manipulation; handles subnormals/inf/nan)
  uint32_t sign = (uint32_t)(h & 0x8000) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      int shift = 0;
      while (!(man & 0x400)) { man <<= 1; ++shift; }
      man &= 0x3FF;
      bits = sign | ((127 - 15 - shift + 1) << 23) | (man << 13);
    }
  } else if (exp == 0x1F) {
    bits = sign | 0x7F800000u | (man << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float out;
  std::memcpy(&out, &bits, 4);
  return out;
}

inline float ld16(const uint8_t* p) {
  uint16_t h;
  std::memcpy(&h, p, 2);
  return f16_to_f32(h);
}

// ---------------------------------------------------------------------------
// per-block kernels: (block bytes) -> (QK floats)
// ---------------------------------------------------------------------------

void blk_q4_0(const uint8_t* b, float* o) {
  const float d = ld16(b);
  for (int i = 0; i < 16; ++i) {
    const uint8_t q = b[2 + i];
    o[i]      = (float)((int)(q & 0x0F) - 8) * d;
    o[i + 16] = (float)((int)(q >> 4) - 8) * d;
  }
}

void blk_q4_1(const uint8_t* b, float* o) {
  const float d = ld16(b), m = ld16(b + 2);
  for (int i = 0; i < 16; ++i) {
    const uint8_t q = b[4 + i];
    o[i]      = (float)(q & 0x0F) * d + m;
    o[i + 16] = (float)(q >> 4) * d + m;
  }
}

void blk_q5_0(const uint8_t* b, float* o) {
  const float d = ld16(b);
  uint32_t qh;
  std::memcpy(&qh, b + 2, 4);
  for (int i = 0; i < 16; ++i) {
    const uint8_t q = b[6 + i];
    const int lo = (q & 0x0F) | (((qh >> i) & 1) << 4);
    const int hi = (q >> 4) | (((qh >> (i + 16)) & 1) << 4);
    o[i]      = (float)(lo - 16) * d;
    o[i + 16] = (float)(hi - 16) * d;
  }
}

void blk_q5_1(const uint8_t* b, float* o) {
  const float d = ld16(b), m = ld16(b + 2);
  uint32_t qh;
  std::memcpy(&qh, b + 4, 4);
  for (int i = 0; i < 16; ++i) {
    const uint8_t q = b[8 + i];
    const int lo = (q & 0x0F) | (((qh >> i) & 1) << 4);
    const int hi = (q >> 4) | (((qh >> (i + 16)) & 1) << 4);
    o[i]      = (float)lo * d + m;
    o[i + 16] = (float)hi * d + m;
  }
}

void blk_q8_0(const uint8_t* b, float* o) {
  const float d = ld16(b);
  const int8_t* q = (const int8_t*)(b + 2);
  for (int i = 0; i < 32; ++i) o[i] = (float)q[i] * d;
}

const float kMxfp4[16] = {0, 1, 2, 3, 4, 6, 8, 12, 0, -1, -2, -3, -4, -6, -8, -12};

void blk_mxfp4(const uint8_t* b, float* o) {
  const float d = std::exp2f((float)((int)b[0] - 127) - 1.0f);
  for (int i = 0; i < 16; ++i) {
    const uint8_t q = b[1 + i];
    o[i]      = kMxfp4[q & 0x0F] * d;
    o[i + 16] = kMxfp4[q >> 4] * d;
  }
}

// K-quant scale unpack (Q4_K/Q5_K 12-byte 6-bit fields)
inline void k4_scales(const uint8_t* s, uint8_t* sc, uint8_t* m) {
  for (int j = 0; j < 4; ++j) {
    sc[j] = s[j] & 63;
    m[j] = s[j + 4] & 63;
    sc[j + 4] = (s[j + 8] & 0x0F) | ((s[j] >> 6) << 4);
    m[j + 4] = (s[j + 8] >> 4) | ((s[j + 4] >> 6) << 4);
  }
}

void blk_q4_k(const uint8_t* b, float* o) {
  const float d = ld16(b), dmin = ld16(b + 2);
  uint8_t sc[8], mn[8];
  k4_scales(b + 4, sc, mn);
  const uint8_t* qs = b + 16;
  for (int j = 0; j < 4; ++j) {
    const float dl1 = d * sc[2 * j], ml1 = dmin * mn[2 * j];
    const float dl2 = d * sc[2 * j + 1], ml2 = dmin * mn[2 * j + 1];
    const uint8_t* q = qs + 32 * j;
    float* out = o + 64 * j;
    for (int i = 0; i < 32; ++i) {
      out[i]      = (float)(q[i] & 0x0F) * dl1 - ml1;
      out[i + 32] = (float)(q[i] >> 4) * dl2 - ml2;
    }
  }
}

void blk_q5_k(const uint8_t* b, float* o) {
  const float d = ld16(b), dmin = ld16(b + 2);
  uint8_t sc[8], mn[8];
  k4_scales(b + 4, sc, mn);
  const uint8_t* qh = b + 16;
  const uint8_t* qs = b + 48;
  for (int j = 0; j < 4; ++j) {
    const float dl1 = d * sc[2 * j], ml1 = dmin * mn[2 * j];
    const float dl2 = d * sc[2 * j + 1], ml2 = dmin * mn[2 * j + 1];
    const uint8_t* q = qs + 32 * j;
    float* out = o + 64 * j;
    for (int i = 0; i < 32; ++i) {
      const int h1 = ((qh[i] >> (2 * j)) & 1) << 4;
      const int h2 = ((qh[i] >> (2 * j + 1)) & 1) << 4;
      out[i]      = (float)((q[i] & 0x0F) | h1) * dl1 - ml1;
      out[i + 32] = (float)((q[i] >> 4) | h2) * dl2 - ml2;
    }
  }
}

void blk_q6_k(const uint8_t* b, float* o) {
  const uint8_t* ql = b;
  const uint8_t* qh = b + 128;
  const int8_t* sc = (const int8_t*)(b + 192);
  const float d = ld16(b + 208);
  for (int half = 0; half < 2; ++half) {
    const uint8_t* lq = ql + 64 * half;
    const uint8_t* hq = qh + 32 * half;
    const int8_t* s = sc + 8 * half;
    float* out = o + 128 * half;
    for (int i = 0; i < 32; ++i) {
      const int q1 = (int)((lq[i] & 0x0F) | (((hq[i] >> 0) & 3) << 4)) - 32;
      const int q2 = (int)((lq[i + 32] & 0x0F) | (((hq[i] >> 2) & 3) << 4)) - 32;
      const int q3 = (int)((lq[i] >> 4) | (((hq[i] >> 4) & 3) << 4)) - 32;
      const int q4 = (int)((lq[i + 32] >> 4) | (((hq[i] >> 6) & 3) << 4)) - 32;
      out[i]      = (float)q1 * (float)s[0 + i / 16] * d;
      out[i + 32] = (float)q2 * (float)s[2 + i / 16] * d;
      out[i + 64] = (float)q3 * (float)s[4 + i / 16] * d;
      out[i + 96] = (float)q4 * (float)s[6 + i / 16] * d;
    }
  }
}

void blk_q2_k(const uint8_t* b, float* o) {
  const uint8_t* scales = b;
  const uint8_t* qs = b + 16;
  const float d = ld16(b + 80), dmin = ld16(b + 82);
  for (int half = 0; half < 2; ++half) {
    const uint8_t* byte = qs + 32 * half;
    for (int j = 0; j < 4; ++j) {
      const int sidx = 8 * half + 2 * j;
      const float dl1 = d * (float)(scales[sidx] & 0x0F);
      const float ml1 = dmin * (float)(scales[sidx] >> 4);
      const float dl2 = d * (float)(scales[sidx + 1] & 0x0F);
      const float ml2 = dmin * (float)(scales[sidx + 1] >> 4);
      float* out = o + 128 * half + 32 * j;
      for (int i = 0; i < 16; ++i) {
        out[i]      = (float)((byte[i] >> (2 * j)) & 3) * dl1 - ml1;
        out[i + 16] = (float)((byte[i + 16] >> (2 * j)) & 3) * dl2 - ml2;
      }
    }
  }
}

void blk_f16(const uint8_t* b, float* o) { o[0] = ld16(b); }

void blk_bf16(const uint8_t* b, float* o) {
  uint32_t bits = ((uint32_t)b[1] << 24) | ((uint32_t)b[0] << 16);
  std::memcpy(o, &bits, 4);
}

struct TypeInfo {
  int qk;      // elements per block
  int bsize;   // bytes per block
  void (*fn)(const uint8_t*, float*);
};

bool type_info(int32_t t, TypeInfo* ti) {
  switch (t) {
    case T_Q4_0:  *ti = {32, 18, blk_q4_0}; return true;
    case T_Q4_1:  *ti = {32, 20, blk_q4_1}; return true;
    case T_Q5_0:  *ti = {32, 22, blk_q5_0}; return true;
    case T_Q5_1:  *ti = {32, 24, blk_q5_1}; return true;
    case T_Q8_0:  *ti = {32, 34, blk_q8_0}; return true;
    case T_Q2_K:  *ti = {256, 84, blk_q2_k}; return true;
    case T_Q4_K:  *ti = {256, 144, blk_q4_k}; return true;
    case T_Q5_K:  *ti = {256, 176, blk_q5_k}; return true;
    case T_Q6_K:  *ti = {256, 210, blk_q6_k}; return true;
    case T_MXFP4: *ti = {32, 17, blk_mxfp4}; return true;
    case T_F16:   *ti = {1, 2, blk_f16}; return true;
    case T_BF16:  *ti = {1, 2, blk_bf16}; return true;
    default: return false;
  }
}

}  // namespace

extern "C" {

// Returns 1 if `ggml_type` is supported by this library.
int lcg_dequant_supported(int32_t ggml_type) {
  TypeInfo ti;
  return type_info(ggml_type, &ti) ? 1 : 0;
}

// Dequantize `n_blocks` blocks of `ggml_type` from `data` into `out`
// (n_blocks * qk floats), using up to `n_threads` threads.
// Returns 0 on success, -1 on unsupported type.
int lcg_dequant(int32_t ggml_type, const uint8_t* data, int64_t n_blocks,
                float* out, int32_t n_threads) {
  TypeInfo ti;
  if (!type_info(ggml_type, &ti)) return -1;
  if (n_threads < 1) n_threads = 1;
  const int64_t kChunk = 1024;  // blocks per work unit
  if (n_blocks < 4 * kChunk || n_threads == 1) {
    for (int64_t i = 0; i < n_blocks; ++i)
      ti.fn(data + i * ti.bsize, out + i * ti.qk);
    return 0;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      const int64_t start = next.fetch_add(kChunk);
      if (start >= n_blocks) break;
      const int64_t end = std::min(start + kChunk, n_blocks);
      for (int64_t i = start; i < end; ++i)
        ti.fn(data + i * ti.bsize, out + i * ti.qk);
    }
  };
  std::vector<std::thread> pool;
  const int nt = (int)std::min<int64_t>(n_threads, (n_blocks + kChunk - 1) / kChunk);
  pool.reserve(nt - 1);
  for (int t = 1; t < nt; ++t) pool.emplace_back(worker);
  worker();
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"
