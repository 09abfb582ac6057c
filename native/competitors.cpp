// Native competitor codecs for speed benchmarking: Gorillas, Chimp,
// Chimp128, Patas (XOR-family, double path, W = 64).
//
// Formats follow the reference implementations the Python spec-level
// round-trips in alp_tpu/competitors/xor_codecs.py were transcribed
// from (reference publication/source_code/include/{gorillas/gorillas.hpp,
// chimp/chimp.hpp, chimp/chimp128.hpp, patas/patas.hpp}); streams here
// are MSB-first bitstreams carrying the same fields, so encoded bit
// counts match the Python *_bits cost models exactly (cross-checked in
// tests/test_competitors.py).  These are the single-core host codecs
// the ALP TPU decode is compared against (table-6-style speed ratios).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BitWriter {
    uint64_t* buf;
    long w = 0;
    uint64_t acc = 0;
    int fill = 0;
    long bits = 0;
    explicit BitWriter(uint64_t* b) : buf(b) {}
    inline void put(uint64_t v, int n) {
        if (!n) return;
        bits += n;
        if (n < 64) v &= (1ULL << n) - 1;
        int rem = 64 - fill;
        if (n < rem) {
            acc = (acc << n) | v;
            fill += n;
        } else if (n == rem) {
            // n == 64 only possible with fill == 0 (acc empty)
            buf[w++] = (fill ? (acc << n) : 0) | v;
            acc = 0;
            fill = 0;
        } else {                 // n > rem >= 1, so both shifts are < 64
            buf[w++] = (acc << rem) | (v >> (n - rem));
            fill = n - rem;      // in [1, 63]
            acc = v & ((1ULL << fill) - 1);
        }
    }
    long finish() {
        if (fill) buf[w++] = acc << (64 - fill);
        return bits;
    }
};

struct BitReader {
    const uint64_t* buf;
    long r = 0;
    uint64_t acc = 0;
    int have = 0;
    explicit BitReader(const uint64_t* b) : buf(b) {}
    inline uint64_t get(int n) {
        if (!n) return 0;
        if (n <= have) {
            uint64_t v = acc >> (64 - n);
            acc = (n < 64) ? (acc << n) : 0;
            have -= n;
            return v;
        }
        int need = n - have;                      // need in [1, 64]
        uint64_t next = buf[r++];
        uint64_t nextbits = (need < 64) ? (next >> (64 - need)) : next;
        // have > 0 implies need <= 63, so the shift below is safe
        uint64_t v = have ? ((acc >> (64 - have)) << need) | nextbits
                          : nextbits;
        acc = (need < 64) ? (next << need) : 0;
        have = 64 - need;
        return v;
    }
};

inline int clz64(uint64_t x) { return x ? __builtin_clzll(x) : 64; }
inline int ctz64(uint64_t x) { return x ? __builtin_ctzll(x) : 64; }

// chimp_utils.hpp LEADING_ROUND / 3-bit representation
const uint8_t LEAD_ROUND[65] = {
    0, 0, 0, 0, 0, 0, 0, 0, 8, 8, 8, 8, 12, 12, 12, 12,
    16, 16, 18, 18, 20, 20, 22, 22,
    24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24,
    24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24, 24,
    24, 24, 24, 24, 24, 24, 24, 24, 24};
inline int lead_repr(int lz) {
    switch (lz) {
        case 0: return 0; case 8: return 1; case 12: return 2;
        case 16: return 3; case 18: return 4; case 20: return 5;
        case 22: return 6; default: return 7;   // 24
    }
}
const int REPR_LEAD[8] = {0, 8, 12, 16, 18, 20, 22, 24};

}  // namespace

extern "C" {

// ------------------------------ Gorillas ------------------------------

long cmp_gorillas_encode_f64(const uint64_t* bits, long n, uint64_t* out) {
    BitWriter bw(out);
    bw.put(bits[0], 64);
    int pl = 0, pt = 0;
    for (long i = 1; i < n; i++) {
        uint64_t x = bits[i] ^ bits[i - 1];
        if (x == 0) { bw.put(0b00, 2); continue; }
        int lz = clz64(x); if (lz > 31) lz = 31;
        int tz = ctz64(x);
        if (lz >= pl && tz >= pt) {
            bw.put(0b10, 2);
            bw.put(x >> pt, 64 - pl - pt);
        } else {
            bw.put(0b11, 2);
            bw.put(lz, 5);
            bw.put(64 - lz - tz - 1, 6);
            bw.put(x >> tz, 64 - lz - tz);
            pl = lz; pt = tz;
        }
    }
    return bw.finish();
}

void cmp_gorillas_decode_f64(const uint64_t* stream, long n, uint64_t* out) {
    BitReader br(stream);
    out[0] = br.get(64);
    int pl = 0, pt = 0;
    for (long i = 1; i < n; i++) {
        int f = (int)br.get(2);
        if (f == 0b00) { out[i] = out[i - 1]; continue; }
        uint64_t x;
        if (f == 0b10) {
            x = br.get(64 - pl - pt) << pt;
        } else {
            pl = (int)br.get(5);
            int sig = (int)br.get(6) + 1;
            pt = 64 - pl - sig;
            x = br.get(sig) << pt;
        }
        out[i] = out[i - 1] ^ x;
    }
}

// ------------------------------- Chimp --------------------------------

long cmp_chimp_encode_f64(const uint64_t* bits, long n, uint64_t* out) {
    BitWriter bw(out);
    bw.put(bits[0], 64);
    int prev_lead = 255;
    for (long i = 1; i < n; i++) {
        uint64_t x = bits[i] ^ bits[i - 1];
        if (x == 0) { bw.put(0b00, 2); prev_lead = 255; continue; }
        int lz = LEAD_ROUND[clz64(x)];
        int tz = ctz64(x);
        if (tz > 6) {
            int sig = 64 - lz - tz;
            bw.put(0b01, 2);
            bw.put(lead_repr(lz), 3);
            bw.put(sig, 6);
            bw.put(x >> tz, sig);
            prev_lead = 255;
        } else if (lz == prev_lead) {
            bw.put(0b10, 2);
            bw.put(x, 64 - lz);
        } else {
            bw.put(0b11, 2);
            bw.put(lead_repr(lz), 3);
            bw.put(x, 64 - lz);
            prev_lead = lz;
        }
    }
    return bw.finish();
}

void cmp_chimp_decode_f64(const uint64_t* stream, long n, uint64_t* out) {
    BitReader br(stream);
    out[0] = br.get(64);
    int prev_lead = 255;
    for (long i = 1; i < n; i++) {
        int f = (int)br.get(2);
        uint64_t x;
        if (f == 0b00) { out[i] = out[i - 1]; prev_lead = 255; continue; }
        if (f == 0b01) {
            int lz = REPR_LEAD[br.get(3)];
            int sig = (int)br.get(6);
            int tz = 64 - lz - sig;
            x = br.get(sig) << tz;
            prev_lead = 255;
        } else if (f == 0b10) {
            x = br.get(64 - prev_lead);
        } else {
            int lz = REPR_LEAD[br.get(3)];
            x = br.get(64 - lz);
            prev_lead = lz;
        }
        out[i] = out[i - 1] ^ x;
    }
}

// ------------------------------ Chimp128 ------------------------------

static const int C128_KEY_BITS = 6 + 7 + 1;           // ring_buffer.hpp:19
static const int C128_THRESHOLD = 6 + 7;

long cmp_chimp128_encode_f64(const uint64_t* bits, long n, uint64_t* out,
                             int64_t* indices_scratch) {
    BitWriter bw(out);
    uint64_t ring[128] = {0};
    int64_t* indices = indices_scratch;               // [1 << 14]
    memset(indices, 0, sizeof(int64_t) << C128_KEY_BITS);
    const uint64_t key_mask = (1ULL << C128_KEY_BITS) - 1;
    uint64_t v0 = bits[0];
    bw.put(v0, 64);
    ring[0] = v0;
    indices[v0 & key_mask] = 0;
    long size = 0;
    int prev_lead = 255;
    for (long i = 1; i < n; i++) {
        uint64_t v = bits[i];
        long key = (long)(v & key_mask);
        long ref_idx = indices[key];
        bool trailing_exceeds = false;
        long prev_index = size % 128;
        int tz = 0;
        uint64_t x;
        if (size - ref_idx < 128) {
            long cur = (ref_idx > size) ? 0 : ref_idx;
            uint64_t tempxor = v ^ ring[cur % 128];
            tz = ctz64(tempxor);
            if (tz > C128_THRESHOLD) {
                trailing_exceeds = true;
                prev_index = cur % 128;
                x = tempxor;
            } else {
                x = v ^ ring[size % 128];
            }
        } else {
            x = v ^ ring[size % 128];
        }
        if (x == 0) {
            bw.put(0b00, 2);
            bw.put(prev_index, 7);
            prev_lead = 255;
        } else {
            int lz = LEAD_ROUND[clz64(x)];
            if (trailing_exceeds) {
                int sig = 64 - lz - tz;
                bw.put(0b01, 2);
                bw.put(prev_index, 7);
                bw.put(lead_repr(lz), 3);
                bw.put(sig, 6);
                bw.put(x >> tz, sig);
                prev_lead = 255;
            } else if (lz == prev_lead) {
                bw.put(0b10, 2);
                bw.put(x, 64 - lz);
            } else {
                bw.put(0b11, 2);
                bw.put(lead_repr(lz), 3);
                bw.put(x, 64 - lz);
                prev_lead = lz;
            }
        }
        size += 1;
        ring[size % 128] = v;
        indices[key] = size;
    }
    return bw.finish();
}

void cmp_chimp128_decode_f64(const uint64_t* stream, long n, uint64_t* out) {
    BitReader br(stream);
    uint64_t ring[128] = {0};
    out[0] = br.get(64);
    ring[0] = out[0];
    long size = 0;
    int prev_lead = 255;
    for (long i = 1; i < n; i++) {
        int f = (int)br.get(2);
        uint64_t v;
        if (f == 0b00) {
            v = ring[br.get(7)];
            prev_lead = 255;
        } else if (f == 0b01) {
            long idx = (long)br.get(7);
            int lz = REPR_LEAD[br.get(3)];
            int sig = (int)br.get(6);
            int tz = 64 - lz - sig;
            v = ring[idx] ^ (br.get(sig) << tz);
            prev_lead = 255;
        } else if (f == 0b10) {
            v = out[i - 1] ^ br.get(64 - prev_lead);
        } else {
            int lz = REPR_LEAD[br.get(3)];
            v = out[i - 1] ^ br.get(64 - lz);
            prev_lead = lz;
        }
        out[i] = v;
        size += 1;
        ring[size % 128] = v;
    }
}

// ------------------------------- Patas --------------------------------
// Stream: per value a 16-bit packed metadata word (index_diff:7,
// byte_count:3, trailing_zeros:6) followed by the byte-aligned payload.

long cmp_patas_encode_f64(const uint64_t* bits, long n, uint64_t* out,
                          int64_t* indices_scratch) {
    BitWriter bw(out);
    uint64_t ring[128] = {0};
    int64_t* indices = indices_scratch;
    memset(indices, 0, sizeof(int64_t) << C128_KEY_BITS);
    const uint64_t key_mask = (1ULL << C128_KEY_BITS) - 1;
    // seed value: 16-bit meta slot (byte_count field can't hold 8, so
    // the decoder special-cases i == 0 and reads a full 64-bit payload)
    bw.put(0, 16);
    bw.put(bits[0], 64);
    ring[0] = bits[0];
    indices[bits[0] & key_mask] = 0;
    long size = 0;
    for (long i = 1; i < n; i++) {
        uint64_t v = bits[i];
        long key = (long)(v & key_mask);
        long ref_idx = indices[key];
        if (ref_idx > size || (size + 1 - ref_idx) >= 128) ref_idx = size;
        uint64_t x = v ^ ring[ref_idx % 128];
        int is_equal = x == 0;
        int tz = ctz64(x);
        int lz = clz64(x);
        int sig_bits = is_equal ? 0 : 64 - tz - lz;
        int sig_bytes = (sig_bits >> 3) + ((sig_bits & 7) ? 1 : 0);
        int shift = tz - is_equal;
        // sig_bytes == 8 wraps to 0 in the 3-bit field; unambiguous
        // because a true empty payload always has shift == 63
        bw.put(((size + 1 - ref_idx) << 9)
               | ((uint64_t)(sig_bytes & 0x7) << 6) | (uint64_t)shift, 16);
        bw.put(x >> shift, sig_bytes * 8);
        size += 1;
        ring[size % 128] = v;
        indices[key] = size;
    }
    return bw.finish();
}

void cmp_patas_decode_f64(const uint64_t* stream, long n, uint64_t* out) {
    BitReader br(stream);
    uint64_t ring[128] = {0};
    for (long i = 0; i < n; i++) {
        uint64_t meta = br.get(16);
        uint64_t v;
        if (i == 0) {
            v = br.get(64);
        } else {
            long idiff = (long)(meta >> 9);
            int nbytes = (int)((meta >> 6) & 0x7);
            int tz = (int)(meta & 0x3F);
            if (nbytes == 0 && tz != 63) nbytes = 8;
            uint64_t val = br.get(nbytes * 8);
            v = (tz < 64)
                ? ring[(i - idiff) % 128] ^ (val << tz)
                : ring[(i - idiff) % 128];
        }
        ring[i % 128] = v;
        out[i] = v;
    }
}

// --------------------- PDE (BtrBlocks Pseudodecimal) ---------------------
// Decode of alp_tpu/competitors/pde_codec.py's streams: out[i] =
// sig[i] * 10^-exp[i] (reference publication/.../btrblocks_copy/
// btrblocks/scheme/double/Pseudodecimal.cpp decompress loop).  Exception
// slots (exponent code 23) read FRAC[23] = 0.0 here and are patched
// verbatim by the caller's vectorised scatter — keeps this loop
// branch-free/autovectorizable, which only HELPS the competitor.
void cmp_pde_decode_f64(const int32_t* sig, const uint8_t* exp, long n,
                        double* out) {
    static const double FRAC[24] = {
        1.0,   1e-1,  1e-2,  1e-3,  1e-4,  1e-5,  1e-6,  1e-7,
        1e-8,  1e-9,  1e-10, 1e-11, 1e-12, 1e-13, 1e-14, 1e-15,
        1e-16, 1e-17, 1e-18, 1e-19, 1e-20, 1e-21, 1e-22, 0.0};
    for (long i = 0; i < n; i++) {
        out[i] = (double)sig[i] * FRAC[exp[i]];
    }
}

// --------------------- chunked multithreaded decode ----------------------
// Thread-parallel decode over independent per-chunk streams (the
// reference's e2e benchmark runs TBB morsels over blocks the same way,
// bench_end_to_end/include/benchmarks/alp/config.hpp threads_pool
// {1, 8, 16}); XOR codecs are sequential WITHIN a stream, so the
// parallel unit is the chunk.
void cmp_chunked_decode_f64(int codec, const uint64_t* stream_words,
                            const long* word_off, const long* ns,
                            const long* out_off, long n_chunks,
                            uint64_t* out, int threads) {
#pragma omp parallel for num_threads(threads) schedule(dynamic)
    for (long c = 0; c < n_chunks; c++) {
        const uint64_t* s = stream_words + word_off[c];
        uint64_t* o = out + out_off[c];
        switch (codec) {
            case 0: cmp_gorillas_decode_f64(s, ns[c], o); break;
            case 1: cmp_chimp_decode_f64(s, ns[c], o); break;
            case 2: cmp_chimp128_decode_f64(s, ns[c], o); break;
            case 3: cmp_patas_decode_f64(s, ns[c], o); break;
            case 4:
                cmp_pde_decode_f64((const int32_t*)s,
                                   (const uint8_t*)(s + (ns[c] + 1) / 2),
                                   ns[c], (double*)o);
                break;
        }
    }
}

// ---------------------- PDE encode (native) ----------------------
// Mirror of alp_tpu/competitors/pde_codec.pde_encode (reference
// publication/.../btrblocks/scheme/double/Pseudodecimal.cpp:82-123):
// smallest exponent e in [0, 22] whose i32-significand round trip is
// bit-exact wins; everything else becomes an exception (code 23,
// sig slot 0, value patched verbatim by the caller).  Returns the
// exception count.  This is the encode-side competitor the reference's
// table-6 COMP1 column shows at 129x slower than ALP compression.
long cmp_pde_encode_f64(const uint64_t* bits, long n, int32_t* sig,
                        uint8_t* exp) {
    static const double FRAC[23] = {
        1.0,   1e-1,  1e-2,  1e-3,  1e-4,  1e-5,  1e-6,  1e-7,
        1e-8,  1e-9,  1e-10, 1e-11, 1e-12, 1e-13, 1e-14, 1e-15,
        1e-16, 1e-17, 1e-18, 1e-19, 1e-20, 1e-21, 1e-22};
    const double lim = 1073741823.0;            // 2^(31-1) - 1
    long patches = 0;
    for (long i = 0; i < n; i++) {
        uint64_t b = bits[i];
        double v;
        memcpy(&v, &b, 8);
        sig[i] = 0;
        exp[i] = 23;
        if (((b >> 52) & 0x7FF) == 0x7FF) { patches++; continue; }
        bool ok = false;
        for (int e = 0; e <= 22 && !ok; e++) {
            double sd = nearbyint(v / FRAC[e]);   // RNE like np.round
            if (!(sd >= -lim && sd <= lim)) continue;
            int32_t si = (int32_t)sd;
            double back = (double)si * FRAC[e];
            uint64_t bb;
            memcpy(&bb, &back, 8);
            if (bb == b) {
                sig[i] = si;
                exp[i] = (uint8_t)e;
                ok = true;
            }
        }
        if (!ok) patches++;
    }
    return patches;
}

// --------------------- chunked multithreaded encode ----------------------
// Encode-side analog of cmp_chunked_decode_f64 for the table-6 COMP
// column (reference publication/tables/table_6.md COMP1; the e2e
// benchmark compresses independent rowgroup blocks under the same TBB
// thread pool).  Each chunk writes into its own worst-case-sized region
// of `out` at out_cap_off[c]; actual word counts land in out_words.
void cmp_chunked_encode_f64(int codec, const uint64_t* in,
                            const long* in_off, const long* ns,
                            long n_chunks, uint64_t* out,
                            const long* out_cap_off, long* out_words,
                            int threads) {
#pragma omp parallel for num_threads(threads) schedule(dynamic)
    for (long c = 0; c < n_chunks; c++) {
        const uint64_t* s = in + in_off[c];
        uint64_t* o = out + out_cap_off[c];
        long nbits = 0;
        switch (codec) {
            case 0: nbits = cmp_gorillas_encode_f64(s, ns[c], o); break;
            case 1: nbits = cmp_chimp_encode_f64(s, ns[c], o); break;
            case 2: {
                std::vector<int64_t> scratch(1 << 14);
                nbits = cmp_chimp128_encode_f64(s, ns[c], o,
                                                scratch.data());
                break;
            }
            case 3: {
                std::vector<int64_t> scratch(1 << 14);
                nbits = cmp_patas_encode_f64(s, ns[c], o,
                                             scratch.data());
                break;
            }
            case 4: {
                // PDE chunk stream layout = pde_chunk_stream: sig i32[n]
                // then exp u8[n], each padded to whole u64 words
                long sig_words = (ns[c] + 1) / 2;
                long exp_words = (ns[c] + 7) / 8;
                memset(o, 0, (size_t)(sig_words + exp_words) * 8);
                cmp_pde_encode_f64(s, ns[c], (int32_t*)o,
                                   (uint8_t*)(o + sig_words));
                nbits = (sig_words + exp_words) * 64;
                break;
            }
        }
        out_words[c] = (nbits + 63) / 64;
    }
}

}  // extern "C"
