// alpcore: native host-side ALP kernels (CPU fallback engine).
//
// TPU-native equivalent of the reference's generated kernel layer
// (reference src/fastlanes_generated_{ffor,unffor}.cpp, src/falp.cpp):
// the TPU path runs Pallas kernels (alp_tpu/kernels/falp.py); this
// library is the host-side engine for environments without an
// accelerator and for zero-copy IO paths.  Not a copy of the generated
// code: one generic bit-offset loop per element width replaces the
// 65-per-width specialisations (the compiler unswitches on bw), with
// the same FastLanes interleaved layout (SURVEY.md §2.1):
//   lanes L = 1024/S, value k at (lane k%L, slot k/L), lane-major word
//   interleave, LSB-first bitstream per lane.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libalpcore.so alpcore.cpp
// ABI: plain C, driven from Python via ctypes (alp_tpu/native.py).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cstdlib>
#include <cmath>

namespace {

constexpr int kVec = 1024;

template <typename UT>
struct Geometry {
  static constexpr int S = sizeof(UT) * 8;
  static constexpr int L = kVec / S;
};

// Pack one 1024-value vector: FOR subtract + FastLanes interleave.
template <typename UT>
void ffor_vec(const UT* in, UT* out, uint8_t bw, UT base) {
  constexpr int S = Geometry<UT>::S;
  constexpr int L = Geometry<UT>::L;
  if (bw == 0) return;
  const UT mask = (bw >= S) ? ~UT(0) : ((UT(1) << bw) - 1);
  std::memset(out, 0, size_t(bw) * L * sizeof(UT));
  for (int lane = 0; lane < L; ++lane) {
    for (int v = 0; v < S; ++v) {
      const UT delta = (in[size_t(v) * L + lane] - base) & mask;
      const int off = v * bw;
      const int w0 = off / S, s0 = off % S;
      out[size_t(w0) * L + lane] |= UT(delta << s0);
      if (s0 + bw > S) {
        out[size_t(w0 + 1) * L + lane] |= UT(delta >> (S - s0));
      }
    }
  }
}

template <typename UT>
void unffor_vec(const UT* in, UT* out, uint8_t bw, UT base) {
  constexpr int S = Geometry<UT>::S;
  constexpr int L = Geometry<UT>::L;
  if (bw == 0) {
    for (int k = 0; k < kVec; ++k) out[k] = base;
    return;
  }
  const UT mask = (bw >= S) ? ~UT(0) : ((UT(1) << bw) - 1);
  for (int lane = 0; lane < L; ++lane) {
    for (int v = 0; v < S; ++v) {
      const int off = v * bw;
      const int w0 = off / S, s0 = off % S;
      UT val = in[size_t(w0) * L + lane] >> s0;
      if (s0 + bw > S) {
        val |= UT(in[size_t(w0 + 1) * L + lane] << (S - s0));
      }
      out[size_t(v) * L + lane] = (val & mask) + base;
    }
  }
}

}  // namespace

extern "C" {

// Batched entry points: n vectors, contiguous buffers.
void alp_ffor_u64(const uint64_t* in, uint64_t* out, int bw, uint64_t base,
                  int n) {
  for (int i = 0; i < n; ++i)
    ffor_vec<uint64_t>(in + size_t(i) * kVec, out + size_t(i) * bw * 16,
                       uint8_t(bw), base);
}
void alp_unffor_u64(const uint64_t* in, uint64_t* out, int bw, uint64_t base,
                    int n) {
  for (int i = 0; i < n; ++i)
    unffor_vec<uint64_t>(in + size_t(i) * bw * 16, out + size_t(i) * kVec,
                         uint8_t(bw), base);
}
void alp_ffor_u32(const uint32_t* in, uint32_t* out, int bw, uint32_t base,
                  int n) {
  for (int i = 0; i < n; ++i)
    ffor_vec<uint32_t>(in + size_t(i) * kVec, out + size_t(i) * bw * 32,
                       uint8_t(bw), base);
}
void alp_unffor_u32(const uint32_t* in, uint32_t* out, int bw, uint32_t base,
                    int n) {
  for (int i = 0; i < n; ++i)
    unffor_vec<uint32_t>(in + size_t(i) * bw * 32, out + size_t(i) * kVec,
                         uint8_t(bw), base);
}
void alp_ffor_u16(const uint16_t* in, uint16_t* out, int bw, uint16_t base,
                  int n) {
  for (int i = 0; i < n; ++i)
    ffor_vec<uint16_t>(in + size_t(i) * kVec, out + size_t(i) * bw * 64,
                       uint8_t(bw), base);
}
void alp_unffor_u16(const uint16_t* in, uint16_t* out, int bw, uint16_t base,
                    int n) {
  for (int i = 0; i < n; ++i)
    unffor_vec<uint16_t>(in + size_t(i) * bw * 64, out + size_t(i) * kVec,
                         uint8_t(bw), base);
}

// Fused falp decode (reference src/falp.cpp:100-120 semantics): unFFOR +
// (int64)(v + base) * FACT, convert to double, * FRAC.  Per-vector
// metadata arrays (bw may differ per vector).
void alp_falp_f64(const uint64_t* packed, const int32_t* packed_offsets,
                  const uint8_t* bws, const int64_t* bases,
                  const int64_t* facts, const double* fracs, double* out,
                  int n) {
  for (int i = 0; i < n; ++i) {
    const int bw = bws[i];
    const uint64_t* in = packed + packed_offsets[i];
    int64_t tmp[kVec];
    unffor_vec<uint64_t>(reinterpret_cast<const uint64_t*>(in),
                         reinterpret_cast<uint64_t*>(tmp), uint8_t(bw),
                         uint64_t(bases[i]));
    const int64_t fact = facts[i];
    const double frac = fracs[i];
    double* o = out + size_t(i) * kVec;
    for (int k = 0; k < kVec; ++k) {
      o[k] = double(int64_t(uint64_t(tmp[k]) * uint64_t(fact))) * frac;
    }
  }
}

void alp_falp_f32(const uint32_t* packed, const int32_t* packed_offsets,
                  const uint8_t* bws, const int32_t* bases,
                  const int32_t* facts, const float* fracs, float* out,
                  int n) {
  for (int i = 0; i < n; ++i) {
    const int bw = bws[i];
    const uint32_t* in = packed + packed_offsets[i];
    int32_t tmp[kVec];
    unffor_vec<uint32_t>(in, reinterpret_cast<uint32_t*>(tmp), uint8_t(bw),
                         uint32_t(bases[i]));
    const int32_t fact = facts[i];
    const float frac = fracs[i];
    float* o = out + size_t(i) * kVec;
    for (int k = 0; k < kVec; ++k) {
      o[k] = float(int32_t(uint32_t(tmp[k]) * uint32_t(fact))) * frac;
    }
  }
}

// ALP_RD glue: value = dict[left_idx] << rbw | right, exceptions patched
// by caller (or left pre-resolved).
void alp_rd_glue_f64(const uint64_t* right, const uint16_t* left_idx,
                     const uint16_t* dict, int dict_size, int rbw,
                     uint64_t* out, int n_values) {
  for (int k = 0; k < n_values; ++k) {
    const int idx = left_idx[k] < dict_size ? left_idx[k] : dict_size - 1;
    out[k] = (uint64_t(dict[idx]) << rbw) | right[k];
  }
}

// Binary-file loader (mmap-free simple read; mirrors
// data/include/data.hpp:16-40 binary branch).
int alp_read_f64(const char* path, double* out, long max_n) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  const long n = long(std::fread(out, sizeof(double), size_t(max_n), f));
  std::fclose(f);
  return int(n);
}

}  // extern "C"
