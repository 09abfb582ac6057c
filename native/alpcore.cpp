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
// Value-outer / lane-inner: the lane loop is contiguous with one
// scalar shift per value row, so it vectorises (vpsllq by scalar) —
// the lane-outer form had strided RMW chains the compiler can't SIMD.
template <typename UT>
void ffor_vec(const UT* __restrict in, UT* __restrict out, uint8_t bw,
              UT base) {
  constexpr int S = Geometry<UT>::S;
  constexpr int L = Geometry<UT>::L;
  if (bw == 0) return;
  const UT mask = (bw >= S) ? ~UT(0) : ((UT(1) << bw) - 1);
  std::memset(out, 0, size_t(bw) * L * sizeof(UT));
  for (int v = 0; v < S; ++v) {
    const int off = v * bw;
    const int w0 = off / S, s0 = off % S;
    const UT* __restrict src = in + size_t(v) * L;
    UT* __restrict d0 = out + size_t(w0) * L;
    #pragma omp simd
    for (int lane = 0; lane < L; ++lane) {
      d0[lane] |= UT(((src[lane] - base) & mask) << s0);
    }
    if (s0 + bw > S) {
      UT* __restrict d1 = out + size_t(w0 + 1) * L;
      const int sr = S - s0;
      #pragma omp simd
      for (int lane = 0; lane < L; ++lane) {
        d1[lane] |= UT(((src[lane] - base) & mask) >> sr);
      }
    }
  }
}

template <typename UT>
void unffor_vec(const UT* __restrict in, UT* __restrict out, uint8_t bw,
                UT base) {
  constexpr int S = Geometry<UT>::S;
  constexpr int L = Geometry<UT>::L;
  if (bw == 0) {
    for (int k = 0; k < kVec; ++k) out[k] = base;
    return;
  }
  const UT mask = (bw >= S) ? ~UT(0) : ((UT(1) << bw) - 1);
  for (int v = 0; v < S; ++v) {
    const int off = v * bw;
    const int w0 = off / S, s0 = off % S;
    const UT* __restrict s0p = in + size_t(w0) * L;
    UT* __restrict dst = out + size_t(v) * L;
    if (s0 + bw > S) {
      const UT* __restrict s1p = in + size_t(w0 + 1) * L;
      const int sl = S - s0;
      #pragma omp simd
      for (int lane = 0; lane < L; ++lane) {
        dst[lane] = ((UT(s0p[lane] >> s0) | UT(s1p[lane] << sl))
                     & mask) + base;
      }
    } else {
      #pragma omp simd
      for (int lane = 0; lane < L; ++lane) {
        dst[lane] = (UT(s0p[lane] >> s0) & mask) + base;
      }
    }
  }
}

}  // namespace

extern "C" {

// Batched entry points: n vectors, contiguous buffers.
void alp_ffor_u64(const uint64_t* in, uint64_t* out, int bw, uint64_t base,
                  int n) {
  #pragma omp parallel for schedule(static) if (n > 32)
  for (int i = 0; i < n; ++i)
    ffor_vec<uint64_t>(in + size_t(i) * kVec, out + size_t(i) * bw * 16,
                       uint8_t(bw), base);
}
void alp_unffor_u64(const uint64_t* in, uint64_t* out, int bw, uint64_t base,
                    int n) {
  #pragma omp parallel for schedule(static) if (n > 32)
  for (int i = 0; i < n; ++i)
    unffor_vec<uint64_t>(in + size_t(i) * bw * 16, out + size_t(i) * kVec,
                         uint8_t(bw), base);
}
void alp_ffor_u64_pv(const uint64_t* in, uint64_t* out, int bw,
                     const uint64_t* bases, int n) {
  #pragma omp parallel for schedule(static) if (n > 32)
  for (int i = 0; i < n; ++i)
    ffor_vec<uint64_t>(in + size_t(i) * kVec, out + size_t(i) * bw * 16,
                       uint8_t(bw), bases[i]);
}
void alp_ffor_u32(const uint32_t* in, uint32_t* out, int bw, uint32_t base,
                  int n) {
  #pragma omp parallel for schedule(static) if (n > 32)
  for (int i = 0; i < n; ++i)
    ffor_vec<uint32_t>(in + size_t(i) * kVec, out + size_t(i) * bw * 32,
                       uint8_t(bw), base);
}
void alp_unffor_u32(const uint32_t* in, uint32_t* out, int bw, uint32_t base,
                    int n) {
  #pragma omp parallel for schedule(static) if (n > 32)
  for (int i = 0; i < n; ++i)
    unffor_vec<uint32_t>(in + size_t(i) * bw * 32, out + size_t(i) * kVec,
                         uint8_t(bw), base);
}
void alp_ffor_u16(const uint16_t* in, uint16_t* out, int bw, uint16_t base,
                  int n) {
  #pragma omp parallel for schedule(static) if (n > 32)
  for (int i = 0; i < n; ++i)
    ffor_vec<uint16_t>(in + size_t(i) * kVec, out + size_t(i) * bw * 64,
                       uint8_t(bw), base);
}
void alp_unffor_u16(const uint16_t* in, uint16_t* out, int bw, uint16_t base,
                    int n) {
  #pragma omp parallel for schedule(static) if (n > 32)
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
  #pragma omp parallel for schedule(static) if (n > 32)
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
  #pragma omp parallel for schedule(static) if (n > 32)
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

// Fused ALP_RD decode (reference rd.hpp:152-178): unFFOR the right
// parts and the left dictionary indexes, resolve through the per-vector
// 8-entry dictionary (index clamped to dict_size - 1, as the host
// decompress does pre-patch) and glue.  Batched over n vectors of one
// (rbw, lbw) bucket; exceptions are patched by the caller.
void alp_rd_decode_f64(const uint64_t* right_packed,
                       const uint16_t* left_packed, const uint16_t* dicts,
                       const int32_t* dict_size, int rbw, int lbw,
                       uint64_t* out, int n) {
  #pragma omp parallel for schedule(static) if (n > 8)
  for (int i = 0; i < n; ++i) {
    uint64_t right[kVec];
    unffor_vec<uint64_t>(right_packed + size_t(i) * rbw * 16, right,
                         uint8_t(rbw), 0);
    uint16_t idx[kVec];
    unffor_vec<uint16_t>(left_packed + size_t(i) * lbw * 64, idx,
                         uint8_t(lbw), 0);
    const uint16_t* d = dicts + size_t(i) * 8;
    const int clamp = dict_size[i] > 0 ? dict_size[i] - 1 : 0;
    // shifted dictionary hoisted to 8 u64s (clamp folded in): the glue
    // loop is then a pure gather+or the compiler can vectorize
    uint64_t dsh[8];
    for (int j = 0; j < 8; ++j) {
      const int js = j < clamp ? j : clamp;
      dsh[j] = uint64_t(d[js]) << rbw;
    }
    uint64_t* o = out + size_t(i) * kVec;
    for (int k = 0; k < kVec; ++k) {
      o[k] = dsh[idx[k] & 7] | right[k];
    }
  }
}

void alp_rd_decode_f32(const uint32_t* right_packed,
                       const uint16_t* left_packed, const uint16_t* dicts,
                       const int32_t* dict_size, int rbw, int lbw,
                       uint32_t* out, int n) {
  #pragma omp parallel for schedule(static) if (n > 8)
  for (int i = 0; i < n; ++i) {
    uint32_t right[kVec];
    unffor_vec<uint32_t>(right_packed + size_t(i) * rbw * 32, right,
                         uint8_t(rbw), 0);
    uint16_t idx[kVec];
    unffor_vec<uint16_t>(left_packed + size_t(i) * lbw * 64, idx,
                         uint8_t(lbw), 0);
    const uint16_t* d = dicts + size_t(i) * 8;
    const int clamp = dict_size[i] > 0 ? dict_size[i] - 1 : 0;
    uint32_t dsh[8];
    for (int j = 0; j < 8; ++j) {
      const int js = j < clamp ? j : clamp;
      dsh[j] = uint32_t(d[js]) << rbw;
    }
    uint32_t* o = out + size_t(i) * kVec;
    for (int k = 0; k < kVec; ++k) {
      o[k] = dsh[idx[k] & 7] | right[k];
    }
  }
}

}  // extern "C"

// ---------------------------------------------------------------------
// Full ALP vector encode (reference encoder.hpp:241-418 semantics).
// Exact C++ double arithmetic gives the reference numerics natively;
// this is the host-side encode engine (the TPU path uses ops.alp /
// Pallas).  Constants are passed in from Python (alp_tpu.constants) so
// there is a single source of truth.
// ---------------------------------------------------------------------

namespace {

struct EncCtx64 {
  const double* exp_arr;    // 10^i
  const double* frac_arr;   // 10^-i
  const int64_t* fact_arr;  // 10^i
  double magic;             // 0x0018000000000000
  double enc_upper;         // ENCODING_UPPER_LIMIT
};

inline int64_t encode_value64(double v, int f, int e, const EncCtx64& c) {
  double tmp = v * c.exp_arr[e] * c.frac_arr[f];
  tmp = tmp + c.magic - c.magic;
  // x86 cvttsd2si semantics (out-of-range / NaN -> INT64_MIN), written
  // branchless (selects) so the encode loop vectorises: the guarded
  // cast is always in range (UB-free) and AVX-512DQ vcvttpd2qq matches
  // the scalar instruction bit-for-bit
  const bool in_range =
      tmp >= -9.223372036854776e18 && tmp < 9.223372036854776e18;
  const int64_t cast = int64_t(in_range ? tmp : 0.0);
  return in_range ? cast : INT64_MIN;
}

inline double decode_value64(int64_t n, int f, int e, const EncCtx64& c) {
  return double(int64_t(uint64_t(n) * uint64_t(c.fact_arr[f]))) *
         c.frac_arr[e];
}

inline bool is_special64(double v) {
  uint64_t bits;
  std::memcpy(&bits, &v, 8);
  return ((bits & 0x7FFFFFFFFFFFFFFFull) >= 0x7FF0000000000000ull) ||
         bits == 0x8000000000000000ull;  // NaN/Inf/-0.0
}

}  // namespace

namespace {

// One vector: second-level (e, f) choice + encode_simdized + analyze
// (encoder.hpp:241-418), shared by the batch entry points.
inline void encode_vector64(const double* data, long vi,
                            const int32_t* combos, int k,
                            const EncCtx64& ctx,
                            uint8_t* out_fac, uint8_t* out_exp,
                            uint8_t* out_bw, int64_t* out_base,
                            int64_t* out_encoded, double* out_exc_values,
                            uint16_t* out_exc_positions,
                            uint16_t* out_exc_count,
                            uint64_t* out_encmax) {
    const double* vec = data + size_t(vi) * kVec;
    // --- second-level choice (encoder.hpp:241-305) -------------------
    int fe = combos[0], ff = combos[1];
    if (k > 1) {
      // encoder.hpp:241-305: 32 strided samples, early exit after 2
      // consecutive non-improvements.
      int found_e = 0, found_f = 0;
      long best = 0;
      int worse = 0;
      for (int ki = 0; ki < k; ++ki) {
        const int e = combos[2 * ki], f = combos[2 * ki + 1];
        int64_t mx = INT64_MIN, mn = INT64_MAX;
        int exc = 0;
        for (int s = 0; s < kVec; s += 32) {
          const double v = vec[s];
          // encode_value<SAFE=true> (is_impossible_to_encode guard)
          const double tmp = v * ctx.exp_arr[e] * ctx.frac_arr[f];
          int64_t n;
          if (!std::isfinite(tmp) || tmp > 9223372036854774784.0 ||
              tmp < -9223372036854774784.0 ||
              (tmp == 0.0 && std::signbit(tmp))) {
            n = int64_t(9223372036854774784.0);  // ENCODING_UPPER_LIMIT
          } else {
            n = encode_value64(v, f, e, ctx);
          }
          if (decode_value64(n, f, e, ctx) == v) {
            if (n > mx) mx = n;
            if (n < mn) mn = n;
          } else {
            ++exc;
          }
        }
        int bits = 0;
        {
          uint64_t delta = uint64_t(mx) - uint64_t(mn);
          while (delta) { ++bits; delta >>= 1; }
        }
        const long est = 32L * bits + exc * (64L + 16L);
        if (ki == 0) {
          best = est; found_e = e; found_f = f;
        } else if (est < best) {
          best = est; found_e = e; found_f = f; worse = 0;
        } else if (++worse == 2) {
          break;
        }
      }
      fe = found_e; ff = found_f;
    }
    out_fac[vi] = uint8_t(ff);
    out_exp[vi] = uint8_t(fe);

    // --- encode_simdized (encoder.hpp:307-400) -----------------------
    // Two passes like the reference: a branchless encode+verify loop
    // the compiler can vectorise (clang vectorize_width(64) analog),
    // then scalar exception compaction (encoder.hpp:351-399).
    int64_t* enc = out_encoded + size_t(vi) * kVec;
    double* excv = out_exc_values + size_t(vi) * kVec;
    uint16_t* excp = out_exc_positions + size_t(vi) * kVec;
    uint8_t ok[kVec];
    const uint64_t factv = uint64_t(ctx.fact_arr[ff]);
    const double fracv = ctx.frac_arr[fe];
    const double ev = ctx.exp_arr[fe];
    const double fv = ctx.frac_arr[ff];
    const double magic = ctx.magic;
#pragma omp simd
    for (int j = 0; j < kVec; ++j) {
      const double v = vec[j];
      const double vr = is_special64(v) ? 9223372036854774784.0 : v;
      double tmp = vr * ev * fv;
      tmp = tmp + magic - magic;
      const bool in_range =
          tmp >= -9.223372036854776e18 && tmp < 9.223372036854776e18;
      const int64_t cast = int64_t(in_range ? tmp : 0.0);
      const int64_t n = in_range ? cast : INT64_MIN;
      enc[j] = n;
      ok[j] = double(int64_t(uint64_t(n) * factv)) * fracv == vr;
    }
    int n_exc = 0;
    int64_t first_ok = 0;
    bool any_ok = false;
    for (int j = 0; j < kVec; ++j) {
      if (!ok[j]) {
        excv[n_exc] = vec[j];
        excp[n_exc] = uint16_t(j);
        ++n_exc;
      } else if (!any_ok) {
        first_ok = enc[j];
        any_ok = true;
      }
    }
    for (int x = 0; x < n_exc; ++x) enc[excp[x]] = first_ok;
    out_exc_count[vi] = uint16_t(n_exc);

    // --- analyze_ffor (encoder.hpp:109-120) --------------------------
    int64_t mx = enc[0], mn = enc[0];
#pragma omp simd reduction(max:mx) reduction(min:mn)
    for (int j = 1; j < kVec; ++j) {
      if (enc[j] > mx) mx = enc[j];
      if (enc[j] < mn) mn = enc[j];
    }
    uint64_t delta = uint64_t(mx) - uint64_t(mn);
    if (out_encmax) out_encmax[vi] = delta;  // format-v2 enc_max
    int bits = 0;
    while (delta) { ++bits; delta >>= 1; }
    out_bw[vi] = uint8_t(bits);
    out_base[vi] = mn;
}

}  // namespace

extern "C" {

// combos: [k, 2] (e, f) pairs; outputs per vector: fac/exp/bw/base,
// patched encoded ints, exception values+positions (capacity 1024 each),
// exc_count.
void alp_encode_f64(const double* data, int n_vectors,
                    const int32_t* combos, int k,
                    const double* exp_arr, const double* frac_arr,
                    const int64_t* fact_arr, double magic,
                    uint8_t* out_fac, uint8_t* out_exp, uint8_t* out_bw,
                    int64_t* out_base, int64_t* out_encoded,
                    double* out_exc_values, uint16_t* out_exc_positions,
                    uint16_t* out_exc_count) {
  EncCtx64 ctx{exp_arr, frac_arr, fact_arr, magic, 0};
  #pragma omp parallel for schedule(static) if (n_vectors > 8)
  for (int vi = 0; vi < n_vectors; ++vi) {
    encode_vector64(data, vi, combos, k, ctx, out_fac, out_exp, out_bw,
                    out_base, out_encoded, out_exc_values,
                    out_exc_positions, out_exc_count, nullptr);
  }
}

// Whole-column encode: per-rowgroup candidate sets, one call, one OMP
// region over every vector (the container's throughput entry point —
// avoids 1 call + output churn per rowgroup).
// combos_all: [n_rg, max_k, 2] int32 padded; k_all: [n_rg].
void alp_encode_f64_multi(const double* data, long n_vectors,
                          const int32_t* combos_all, const int32_t* k_all,
                          int max_k, int vectors_per_rg,
                          const double* exp_arr, const double* frac_arr,
                          const int64_t* fact_arr, double magic,
                          uint8_t* out_fac, uint8_t* out_exp,
                          uint8_t* out_bw, int64_t* out_base,
                          int64_t* out_encoded, double* out_exc_values,
                          uint16_t* out_exc_positions,
                          uint16_t* out_exc_count,
                          uint64_t* out_encmax) {
  EncCtx64 ctx{exp_arr, frac_arr, fact_arr, magic, 0};
  #pragma omp parallel for schedule(dynamic, 16) if (n_vectors > 8)
  for (long vi = 0; vi < n_vectors; ++vi) {
    const long rg = vi / vectors_per_rg;
    encode_vector64(data, vi, combos_all + rg * 2 * max_k,
                    k_all[rg], ctx, out_fac, out_exp, out_bw, out_base,
                    out_encoded, out_exc_values, out_exc_positions,
                    out_exc_count, out_encmax);
  }
}

// Whole-column ragged FFOR pack: every vector packed at ITS OWN bit
// width straight into one output buffer at precomputed word offsets
// (no per-bucket gathers or copies; one OpenMP region).
void alp_ffor_ragged_u64(const uint64_t* in, uint64_t* out,
                         const uint8_t* bw, const uint64_t* base,
                         const int64_t* word_off, long n_vectors) {
  #pragma omp parallel for schedule(dynamic, 64) if (n_vectors > 8)
  for (long vi = 0; vi < n_vectors; ++vi) {
    if (bw[vi] == 0) continue;
    ffor_vec<uint64_t>(in + size_t(vi) * kVec, out + word_off[vi],
                       bw[vi], base[vi]);
  }
}

// Rowgroup planning: first-level sampling + top-k (e, f) search +
// scheme decision (reference sampler.hpp:15-52, encoder.hpp:139-235),
// and the ALP_RD dictionary construction (rd.hpp:33-104).
int alp_init_f64(const double* data, long data_size, long offset,
                 const double* exp_arr, const double* frac_arr,
                 const int64_t* fact_arr, double magic,
                 int max_exponent, long rd_threshold,
                 int32_t* out_combos /*[5][2] (e,f)*/, int32_t* out_k) {
  EncCtx64 ctx{exp_arr, frac_arr, fact_arr, magic, 0};
  // --- first_level_sample (sampler.hpp) ------------------------------
  constexpr int kRowgroupSize = 100 * kVec;
  constexpr int kSamplesPerVec = 32;
  constexpr int kRowgroupSamples = 8;
  constexpr int kJump = 100 / kRowgroupSamples;  // ROWGROUP_SAMPLES_JUMP
  double sample[kRowgroupSamples * 2 * kSamplesPerVec];
  int n_sample = 0;
  {
    const long left = data_size - offset;
    const long portion = left < kRowgroupSize ? left : kRowgroupSize;
    const long avail_vec = (portion + kVec - 1) / kVec;
    long idx = offset;
    for (long vi = 0; vi < avail_vec; ++vi) {
      const long cur = (data_size - idx) < kVec ? (data_size - idx) : kVec;
      if (vi % kJump != 0) { idx += cur; continue; }
      const long inc =
          (cur + kSamplesPerVec - 1) / kSamplesPerVec > 0
              ? (cur + kSamplesPerVec - 1) / kSamplesPerVec : 1;
      if (cur < kSamplesPerVec && n_sample > 0) { idx += cur; continue; }
      for (long j = 0; j < cur; j += inc) sample[n_sample++] = data[idx + j];
      idx += cur;
    }
  }
  // --- find_top_k_combinations (encoder.hpp:139-235) -----------------
  const int ss = n_sample < kSamplesPerVec ? n_sample : kSamplesPerVec;
  const int n_vec = ss ? (n_sample + ss - 1) / ss : 0;
  const long worst = ss * (64L + 16L) + ss * 64L;
  long best_estimated = worst;
  // vote map over (e, f): max 19*20/2 pairs
  int counts[32][32] = {};
  for (int vi = 0; vi < n_vec; ++vi) {
    const double* chunk = sample + vi * ss;
    const int cn = (vi + 1) * ss <= n_sample ? ss : (n_sample - vi * ss);
    int found_e = 0, found_f = 0;
    long best = worst;
    for (int e = max_exponent; e >= 0; --e) {
      for (int f = e; f >= 0; --f) {
        int64_t mx = INT64_MIN, mn = INT64_MAX;
        int non_exc = 0;
        for (int s = 0; s < cn; ++s) {
          const double v = chunk[s];
          const double tmp = v * ctx.exp_arr[e] * ctx.frac_arr[f];
          int64_t n;
          if (!std::isfinite(tmp) || tmp > 9223372036854774784.0 ||
              tmp < -9223372036854774784.0 ||
              (tmp == 0.0 && std::signbit(tmp))) {
            n = int64_t(9223372036854774784.0);
          } else {
            n = encode_value64(v, f, e, ctx);
          }
          if (decode_value64(n, f, e, ctx) == v) {
            ++non_exc;
            if (n > mx) mx = n;
            if (n < mn) mn = n;
          }
        }
        if (non_exc < 2) continue;
        int bits = 0;
        uint64_t delta = uint64_t(mx) - uint64_t(mn);
        while (delta) { ++bits; delta >>= 1; }
        const long est = long(ss) * bits + (ss - non_exc) * (64L + 16L);
        if (est < best || (est == best && found_e < e) ||
            (est == best && found_e == e && found_f < f)) {
          best = est; found_e = e; found_f = f;
          if (best < best_estimated) best_estimated = best;
        }
      }
    }
    ++counts[found_e][found_f];
  }
  if (best_estimated >= rd_threshold) return 1;  // SCHEME_ALP_RD
  // rank by (count desc, e desc, f desc), keep top 5
  int k = 0;
  for (int rank = 0; rank < 5; ++rank) {
    int be = -1, bf = -1, bc = 0;
    for (int e = max_exponent; e >= 0; --e)
      for (int f = e; f >= 0; --f)
        if (counts[e][f] > bc) { bc = counts[e][f]; be = e; bf = f; }
    if (bc == 0) break;
    out_combos[2 * rank] = be;
    out_combos[2 * rank + 1] = bf;
    counts[be][bf] = 0;
    ++k;
  }
  if (k == 0) { out_combos[0] = 0; out_combos[1] = 0; k = 1; }
  *out_k = k;
  return 2;  // SCHEME_ALP
}


// Whole-column planning: one OpenMP region over every rowgroup
// (each rowgroup's sampling + top-k search is independent).
void alp_init_f64_multi(const double* data, long data_size, long n_rg,
                        int vectors_per_rg, int max_k,
                        const double* exp_arr, const double* frac_arr,
                        const int64_t* fact_arr, double magic,
                        int max_exponent, long rd_threshold,
                        int32_t* out_schemes /*[n_rg]*/,
                        int32_t* out_combos /*[n_rg][max_k][2]*/,
                        int32_t* out_k /*[n_rg]*/) {
  #pragma omp parallel for schedule(dynamic) if (n_rg > 2)
  for (long rg = 0; rg < n_rg; ++rg) {
    // alp_init_f64 writes up to 5 (e,f) ranks (MAX_K_COMBINATIONS);
    // stage through a local buffer so a caller-provided max_k < 5
    // cannot overflow its per-rowgroup slice.
    int32_t combos[10] = {};
    int32_t k = 0;
    out_schemes[rg] = alp_init_f64(
        data, data_size, rg * long(vectors_per_rg) * kVec, exp_arr,
        frac_arr, fact_arr, magic, max_exponent, rd_threshold, combos, &k);
    if (k > max_k) k = max_k;
    out_k[rg] = k;
    for (int i = 0; i < 2 * k; ++i) out_combos[rg * 2L * max_k + i] = combos[i];
  }
}

}  // extern "C"

// ---------------------------------------------------------------------
// float32 encode engine (the float instantiation of encoder.hpp:241-418;
// mirrors the f64 functions above with float arithmetic and the
// reference's float quirks: the out-of-range ENCODING limits compare as
// DOUBLE, the fallback cast of ENCODING_UPPER_LIMIT to int32 is
// INT32_MIN, and FACT_ARR has only fact_len entries so factor ==
// fact_len reads out of bounds in the reference — modeled as NaN
// (never round-trips), exactly like alp_tpu.oracle.core.decode_value.
// ---------------------------------------------------------------------

namespace {

struct EncCtx32 {
  const float* exp_arr;     // 10^i
  const float* frac_arr;    // 10^-i
  const int32_t* fact_arr;  // 10^i
  int fact_len;
  float magic;              // 2^23 + 2^22
  float upper_pt;           // float(ENCODING_UPPER_LIMIT)
};

inline int32_t encode_value32(float v, int f, int e, const EncCtx32& c) {
  float tmp = v * c.exp_arr[e] * c.frac_arr[f];
  tmp = tmp + c.magic - c.magic;
  // cvttss2si semantics, branchless (float compares; NaN -> false)
  const bool in_range = tmp >= -2147483648.0f && tmp < 2147483648.0f;
  const int32_t cast = int32_t(in_range ? tmp : 0.0f);
  return in_range ? cast : INT32_MIN;
}

inline float decode_value32(int32_t n, int f, int e, const EncCtx32& c) {
  if (f >= c.fact_len) return NAN;  // reference OOB factor read, modeled
  return float(int32_t(uint32_t(n) * uint32_t(c.fact_arr[f]))) *
         c.frac_arr[e];
}

inline bool is_special32(float v) {
  uint32_t bits;
  std::memcpy(&bits, &v, 4);
  return ((bits & 0x7FFFFFFFu) >= 0x7F800000u) || bits == 0x80000000u;
}

// SAFE=true encode for the (e, f) search: the range guard compares the
// scaled value as DOUBLE against the int64 ENCODING limits (the C++
// reference promotes; encoder.hpp:82-89 float instantiation), and the
// fallback ENCODING_UPPER_LIMIT cast to int32 is INT32_MIN.
inline int32_t encode_value32_safe(float v, int f, int e,
                                   const EncCtx32& c) {
  const double tmp = double(v * c.exp_arr[e] * c.frac_arr[f]);
  if (!std::isfinite(tmp) || tmp > 9223372036854774784.0 ||
      tmp < -9223372036854774784.0 ||
      (tmp == 0.0 && std::signbit(tmp))) {
    return INT32_MIN;
  }
  return encode_value32(v, f, e, c);
}

inline void encode_vector32(const float* data, long vi,
                            const int32_t* combos, int k,
                            const EncCtx32& ctx,
                            uint8_t* out_fac, uint8_t* out_exp,
                            uint8_t* out_bw, int32_t* out_base,
                            int32_t* out_encoded, float* out_exc_values,
                            uint16_t* out_exc_positions,
                            uint16_t* out_exc_count,
                            uint64_t* out_encmax) {
    const float* vec = data + size_t(vi) * kVec;
    // --- second-level choice (encoder.hpp:241-305) -------------------
    int fe = combos[0], ff = combos[1];
    if (k > 1) {
      int found_e = 0, found_f = 0;
      long best = 0;
      int worse = 0;
      for (int ki = 0; ki < k; ++ki) {
        const int e = combos[2 * ki], f = combos[2 * ki + 1];
        int32_t mx = INT32_MIN, mn = INT32_MAX;
        int exc = 0;
        for (int s = 0; s < kVec; s += 32) {
          const int32_t n = encode_value32_safe(vec[s], f, e, ctx);
          if (decode_value32(n, f, e, ctx) == vec[s]) {
            if (n > mx) mx = n;
            if (n < mn) mn = n;
          } else {
            ++exc;
          }
        }
        int bits = 0;
        {
          uint32_t delta = uint32_t(mx) - uint32_t(mn);
          while (delta) { ++bits; delta >>= 1; }
        }
        const long est = 32L * bits + exc * (32L + 16L);
        if (ki == 0) {
          best = est; found_e = e; found_f = f;
        } else if (est < best) {
          best = est; found_e = e; found_f = f; worse = 0;
        } else if (++worse == 2) {
          break;
        }
      }
      fe = found_e; ff = found_f;
    }
    out_fac[vi] = uint8_t(ff);
    out_exp[vi] = uint8_t(fe);

    // --- encode_simdized (encoder.hpp:307-400) -----------------------
    int32_t* enc = out_encoded + size_t(vi) * kVec;
    float* excv = out_exc_values + size_t(vi) * kVec;
    uint16_t* excp = out_exc_positions + size_t(vi) * kVec;
    uint8_t ok[kVec];
    const float upper = ctx.upper_pt;
    // loop-invariant table reads hoisted so the verify stays a pure
    // vector pipeline; the reference's OOB FACT_ARR quirk (factor index
    // past the table decodes NaN, never equal) collapses to fact_oob
    const bool fact_oob = ff >= ctx.fact_len;
    const uint32_t factv = fact_oob ? 0u : uint32_t(ctx.fact_arr[ff]);
    const float fracv = ctx.frac_arr[fe];
    const float ev = ctx.exp_arr[fe];
    const float fv = ctx.frac_arr[ff];
    const float magic = ctx.magic;
#pragma omp simd
    for (int j = 0; j < kVec; ++j) {
      const float v = vec[j];
      const float vr = is_special32(v) ? upper : v;
      float tmp = vr * ev * fv;
      tmp = tmp + magic - magic;
      const bool in_range = tmp >= -2147483648.0f && tmp < 2147483648.0f;
      const int32_t cast = int32_t(in_range ? tmp : 0.0f);
      const int32_t n = in_range ? cast : INT32_MIN;
      enc[j] = n;
      ok[j] = !fact_oob &
              (float(int32_t(uint32_t(n) * factv)) * fracv == vr);
    }
    int n_exc = 0;
    int32_t first_ok = 0;
    bool any_ok = false;
    for (int j = 0; j < kVec; ++j) {
      if (!ok[j]) {
        excv[n_exc] = vec[j];
        excp[n_exc] = uint16_t(j);
        ++n_exc;
      } else if (!any_ok) {
        first_ok = enc[j];
        any_ok = true;
      }
    }
    for (int x = 0; x < n_exc; ++x) enc[excp[x]] = first_ok;
    out_exc_count[vi] = uint16_t(n_exc);

    // --- analyze_ffor (encoder.hpp:109-120) --------------------------
    int32_t mx = enc[0], mn = enc[0];
#pragma omp simd reduction(max:mx) reduction(min:mn)
    for (int j = 1; j < kVec; ++j) {
      if (enc[j] > mx) mx = enc[j];
      if (enc[j] < mn) mn = enc[j];
    }
    uint32_t delta = uint32_t(mx) - uint32_t(mn);
    if (out_encmax) out_encmax[vi] = delta;
    int bits = 0;
    while (delta) { ++bits; delta >>= 1; }
    out_bw[vi] = uint8_t(bits);
    out_base[vi] = mn;
}

// Rowgroup planning, float (sampler.hpp + encoder.hpp:139-235 float
// instantiation; same structure as alp_init_f64 with the f32 cost
// model: exception cost 32+16 bits, FACT OOB quirk in the decode).
int alp_init_f32_one(const float* data, long data_size, long offset,
                     const EncCtx32& ctx, int max_exponent,
                     long rd_threshold, int32_t* out_combos,
                     int32_t* out_k) {
  constexpr int kRowgroupSize = 100 * kVec;
  constexpr int kSamplesPerVec = 32;
  constexpr int kRowgroupSamples = 8;
  float sample[kRowgroupSamples * 2 * kSamplesPerVec];
  int n_sample = 0;
  {
    const long left = data_size - offset;
    const long portion = left < kRowgroupSize ? left : kRowgroupSize;
    const long avail_vec = (portion + kVec - 1) / kVec;
    long idx = offset;
    for (long vi = 0; vi < avail_vec; ++vi) {
      const long cur = (data_size - idx) < kVec ? (data_size - idx) : kVec;
      if (vi % (100 / kRowgroupSamples) != 0) { idx += cur; continue; }
      const long inc =
          (cur + kSamplesPerVec - 1) / kSamplesPerVec > 0
              ? (cur + kSamplesPerVec - 1) / kSamplesPerVec : 1;
      if (cur < kSamplesPerVec && n_sample > 0) { idx += cur; continue; }
      for (long j = 0; j < cur; j += inc) sample[n_sample++] = data[idx + j];
      idx += cur;
    }
  }
  const int ss = n_sample < kSamplesPerVec ? n_sample : kSamplesPerVec;
  const int n_vec = ss ? (n_sample + ss - 1) / ss : 0;
  const long worst = ss * (32L + 16L) + ss * 32L;
  long best_estimated = worst;
  int counts[32][32] = {};
  for (int vi = 0; vi < n_vec; ++vi) {
    const float* chunk = sample + vi * ss;
    const int cn = (vi + 1) * ss <= n_sample ? ss : (n_sample - vi * ss);
    int found_e = 0, found_f = 0;
    long best = worst;
    for (int e = max_exponent; e >= 0; --e) {
      for (int f = e; f >= 0; --f) {
        int32_t mx = INT32_MIN, mn = INT32_MAX;
        int non_exc = 0;
        for (int s = 0; s < cn; ++s) {
          const float v = chunk[s];
          const int32_t n = encode_value32_safe(v, f, e, ctx);
          if (decode_value32(n, f, e, ctx) == v) {
            ++non_exc;
            if (n > mx) mx = n;
            if (n < mn) mn = n;
          }
        }
        if (non_exc < 2) continue;
        int bits = 0;
        uint32_t delta = uint32_t(mx) - uint32_t(mn);
        while (delta) { ++bits; delta >>= 1; }
        const long est = long(ss) * bits + (ss - non_exc) * (32L + 16L);
        if (est < best || (est == best && found_e < e) ||
            (est == best && found_e == e && found_f < f)) {
          best = est; found_e = e; found_f = f;
          if (best < best_estimated) best_estimated = best;
        }
      }
    }
    ++counts[found_e][found_f];
  }
  if (best_estimated >= rd_threshold) return 1;  // SCHEME_ALP_RD
  int k = 0;
  for (int rank = 0; rank < 5; ++rank) {
    int be = -1, bf = -1, bc = 0;
    for (int e = max_exponent; e >= 0; --e)
      for (int f = e; f >= 0; --f)
        if (counts[e][f] > bc) { bc = counts[e][f]; be = e; bf = f; }
    if (bc == 0) break;
    out_combos[2 * rank] = be;
    out_combos[2 * rank + 1] = bf;
    counts[be][bf] = 0;
    ++k;
  }
  if (k == 0) { out_combos[0] = 0; out_combos[1] = 0; k = 1; }
  *out_k = k;
  return 2;  // SCHEME_ALP
}

}  // namespace

extern "C" {

void alp_encode_f32_multi(const float* data, long n_vectors,
                          const int32_t* combos_all, const int32_t* k_all,
                          int max_k, int vectors_per_rg,
                          const float* exp_arr, const float* frac_arr,
                          const int32_t* fact_arr, int fact_len,
                          float magic, float upper_pt,
                          uint8_t* out_fac, uint8_t* out_exp,
                          uint8_t* out_bw, int32_t* out_base,
                          int32_t* out_encoded, float* out_exc_values,
                          uint16_t* out_exc_positions,
                          uint16_t* out_exc_count,
                          uint64_t* out_encmax) {
  EncCtx32 ctx{exp_arr, frac_arr, fact_arr, fact_len, magic, upper_pt};
  #pragma omp parallel for schedule(dynamic, 16) if (n_vectors > 8)
  for (long vi = 0; vi < n_vectors; ++vi) {
    const long rg = vi / vectors_per_rg;
    encode_vector32(data, vi, combos_all + rg * 2 * max_k,
                    k_all[rg], ctx, out_fac, out_exp, out_bw, out_base,
                    out_encoded, out_exc_values, out_exc_positions,
                    out_exc_count, out_encmax);
  }
}

void alp_init_f32_multi(const float* data, long data_size, long n_rg,
                        int vectors_per_rg, int max_k,
                        const float* exp_arr, const float* frac_arr,
                        const int32_t* fact_arr, int fact_len,
                        float magic, float upper_pt, int max_exponent,
                        long rd_threshold, int32_t* out_schemes,
                        int32_t* out_combos, int32_t* out_k) {
  EncCtx32 ctx{exp_arr, frac_arr, fact_arr, fact_len, magic, upper_pt};
  #pragma omp parallel for schedule(dynamic) if (n_rg > 2)
  for (long rg = 0; rg < n_rg; ++rg) {
    int32_t combos[10] = {};
    int32_t k = 0;
    out_schemes[rg] = alp_init_f32_one(
        data, data_size, rg * long(vectors_per_rg) * kVec, ctx,
        max_exponent, rd_threshold, combos, &k);
    if (k > max_k) k = max_k;
    out_k[rg] = k;
    for (int i = 0; i < 2 * k; ++i) out_combos[rg * 2L * max_k + i] = combos[i];
  }
}

// Whole-column ragged FFOR pack, u32 lanes (the f32 twin of
// alp_ffor_ragged_u64; word offsets = bw * 32 per vector).
void alp_ffor_ragged_u32(const uint32_t* in, uint32_t* out,
                         const uint8_t* bw, const uint32_t* base,
                         const int64_t* word_off, long n_vectors) {
  #pragma omp parallel for schedule(dynamic, 64) if (n_vectors > 8)
  for (long vi = 0; vi < n_vectors; ++vi) {
    if (bw[vi] == 0) continue;
    ffor_vec<uint32_t>(in + size_t(vi) * kVec, out + word_off[vi],
                       bw[vi], base[vi]);
  }
}

}  // extern "C"

extern "C" {

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
