// Native kstream host engine: rolling-window packed keys -> parallel LSD
// radix sort -> text decode, one call per (file, plan).
//
// Covers exactly the plan shapes of the host-vectorized numpy engine
// (krisp_tpu/kstream_vec.py): ONE k-mer length — k<=32 in one u64 key
// (kstream_core_run), 33..64 in a lo/hi pair (kstream_core_run_w2) —
// modes plain/complements/canonicals, sorted output with duplicate
// lines re-emitted.  All base semantics (encode ranks, validity incl.
// --disallow/--omitsoft, decode alphabet) come from tables passed in by the
// caller — the same dna.py tables the numpy engine uses — so the two
// engines cannot drift.  Reference behavior being replaced: the
// per-character Python k-mer loop + GNU sort pipe of
// src/krisp/kstream/kstream.py (hot loop around lines 617-642).
//
// Key layout matches kstream_vec._pack_keys: base at the window start in
// the HIGH bits (numeric order == lexicographic order), right-aligned to
// the low 2k bits.  Reverse complement matches _revcomp_keys: complement
// (3-c) of each base, base order reversed.  Sorting is a stable 8-bit LSD
// radix over ceil(2k/8) byte digits, each pass histogram+scatter across a
// small thread team; equal keys are bit-identical so stability questions
// cannot reach the output.
//
// Exposed via ctypes (no pybind11 in this environment):
//   int64_t kstream_core_run(buf, n, k, mode, code_tab, valid_tab,
//                            decode_tab, threads, write_cb)
// returning the emitted line count (output bytes stream through write_cb
// in bounded slabs; -1 = allocation failure, -2 = callback failure).

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <thread>
#include <vector>
#include <array>

// Output is streamed through a caller-supplied write callback in bounded
// slabs, so peak memory is keys + radix scratch + one slab — GB-scale
// inputs never materialize the full decoded text.
extern "C" {
typedef int64_t (*ks_write_fn)(const uint8_t* data, int64_t len);
}

namespace {

enum Mode { PLAIN = 0, COMPLEMENTS = 1, CANONICALS = 2 };

// KSCORE_TIMING=1: print per-phase wall times to stderr (perf triage only)
struct PhaseClock {
    bool on = getenv("KSCORE_TIMING") != nullptr;
    std::chrono::steady_clock::time_point t0 =
        std::chrono::steady_clock::now();
    void lap(const char* name) {
        if (!on) return;
        auto t1 = std::chrono::steady_clock::now();
        fprintf(stderr, "[kscore] %-8s %6.1f ms\n", name,
                std::chrono::duration<double, std::milli>(t1 - t0).count());
        t0 = t1;
    }
};

template <class F>
void run_team(int T, F&& body) {
    if (T <= 1) { body(0); return; }
    std::vector<std::thread> ts;
    ts.reserve(T - 1);
    for (int t = 1; t < T; ++t) ts.emplace_back(body, t);
    body(0);
    for (auto& th : ts) th.join();
}

// Stable LSD radix sort on the low `bits` bits: 14-bit digits (16K
// buckets — per-thread cursor tables stay L2-resident while halving the
// pass count vs 8-bit digits).  `tmp` is scratch of the same size; the
// sorted data always ends back in `a`.
// Large-n variant: ONE top-digit MSD partition pass (the only pass whose
// scatter walks the whole array), then each bucket — now ~n/16K keys,
// cache/TLB-resident — is fully sorted independently with dynamic
// bucket-stealing across the team.  Past ~32M keys the plain LSD's 4
// full-array scatter passes thrash the TLB (measured 3.3x rate loss at
// 500M keys); this replaces 4 full walks with 1 + in-cache work.
// Output is a full numeric sort either way — identical bytes.
void msd_bucket_sort_u64(uint64_t* a, uint64_t* tmp, int64_t n, int bits,
                         int T) {
    constexpr int DIG = 14;
    constexpr int NB = 1 << DIG;
    const int top_shift = bits > DIG ? bits - DIG : 0;
    std::vector<std::vector<int64_t>> counts(T), starts(T);
    for (int t = 0; t < T; ++t) {
        counts[t].assign(NB, 0);
        starts[t].resize(NB);
    }
    run_team(T, [&](int t) {
        auto& c = counts[t];
        const int64_t lo = n * t / T, hi = n * (t + 1) / T;
        for (int64_t i = lo; i < hi; ++i)
            c[(a[i] >> top_shift) & (NB - 1)]++;
    });
    std::vector<int64_t> bucket_lo(NB + 1);
    int64_t off = 0;
    for (int d = 0; d < NB; ++d) {
        bucket_lo[d] = off;
        for (int t = 0; t < T; ++t) {
            starts[t][d] = off;
            off += counts[t][d];
        }
    }
    bucket_lo[NB] = n;
    run_team(T, [&](int t) {
        int64_t* s = starts[t].data();
        const int64_t lo = n * t / T, hi = n * (t + 1) / T;
        for (int64_t i = lo; i < hi; ++i) {
            const uint64_t v = a[i];
            tmp[s[(v >> top_shift) & (NB - 1)]++] = v;
        }
    });
    std::atomic<int> next{0};
    run_team(T, [&](int) {
        for (int d = next.fetch_add(1); d < NB; d = next.fetch_add(1)) {
            const int64_t lo = bucket_lo[d], hi = bucket_lo[d + 1];
            if (lo == hi) continue;
            std::sort(tmp + lo, tmp + hi);
            memcpy(a + lo, tmp + lo, size_t(hi - lo) * 8);
        }
    });
}

void radix_sort_u64(uint64_t* a, uint64_t* tmp, int64_t n, int bits,
                    int T) {
    constexpr int DIG = 14;
    constexpr int NB = 1 << DIG;
    if (n >= (int64_t(1) << 25) && bits > DIG) {
        msd_bucket_sort_u64(a, tmp, n, bits, T);
        return;
    }
    const int passes = (bits + DIG - 1) / DIG;
    std::vector<std::vector<int64_t>> counts(T), starts(T);
    for (int t = 0; t < T; ++t) {
        counts[t].resize(NB);
        starts[t].resize(NB);
    }
    uint64_t* src = a;
    uint64_t* dst = tmp;
    for (int p = 0; p < passes; ++p) {
        const int shift = DIG * p;
        run_team(T, [&](int t) {
            auto& c = counts[t];
            std::fill(c.begin(), c.end(), 0);
            const int64_t lo = n * t / T, hi = n * (t + 1) / T;
            for (int64_t i = lo; i < hi; ++i)
                c[(src[i] >> shift) & (NB - 1)]++;
        });
        int64_t off = 0;
        for (int d = 0; d < NB; ++d)
            for (int t = 0; t < T; ++t) {
                starts[t][d] = off;
                off += counts[t][d];
            }
        run_team(T, [&](int t) {
            int64_t* s = starts[t].data();
            const int64_t lo = n * t / T, hi = n * (t + 1) / T;
            for (int64_t i = lo; i < hi; ++i) {
                const uint64_t v = src[i];
                dst[s[(v >> shift) & (NB - 1)]++] = v;
            }
        });
        std::swap(src, dst);
    }
    if (src != a) memcpy(a, src, size_t(n) * 8);
}

}  // namespace

extern "C" {

// Returns the emitted line count; -1 on allocation failure (caller falls
// back to the numpy path), -2 when the write callback reports failure.
int64_t kstream_core_run(const uint8_t* buf, int64_t n, int k, int mode,
                         const uint8_t* code_tab,
                         const uint8_t* valid_tab,
                         const uint8_t* decode_tab, int threads,
                         ks_write_fn write_cb) {
    if (k < 1 || k > 32 || n < k) return 0;
    const int64_t n_win = n - k + 1;
    int T = threads > 0 ? threads : 1;
    if (int64_t(T) > n_win) T = 1;
    PhaseClock clk;

    // ---- phase A: rolling window keys, validity-compacted, per thread
    const uint64_t mask = (k == 32) ? ~0ull : ((1ull << (2 * k)) - 1);
    const int rc_top = 2 * (k - 1);
    std::vector<std::vector<uint64_t>> parts(T);
    run_team(T, [&](int t) {
        const int64_t wlo = n_win * t / T, whi = n_win * (t + 1) / T;
        auto& out = parts[t];
        out.resize(size_t(whi - wlo) * (mode == COMPLEMENTS ? 2 : 1));
        uint64_t* w = out.data();
        uint64_t fwd = 0, rc = 0;
        int64_t last_bad = wlo - 1;
        // prime the first k-1 bases of the first window
        for (int64_t j = wlo; j < wlo + k - 1; ++j) {
            const uint8_t b = buf[j];
            const uint64_t c = code_tab[b] & 3u;
            fwd = ((fwd << 2) | c) & mask;
            rc = (rc >> 2) | ((3ull - c) << rc_top);
            if (!valid_tab[b]) last_bad = j;
        }
        // per-mode loops with a raw write cursor (no per-window capacity
        // checks or mode dispatch); the final resize trims dropped windows
        switch (mode) {
            case PLAIN:
                for (int64_t i = wlo; i < whi; ++i) {
                    const uint8_t b = buf[i + k - 1];
                    const uint64_t c = code_tab[b] & 3u;
                    fwd = ((fwd << 2) | c) & mask;
                    if (!valid_tab[b]) last_bad = i + k - 1;
                    *w = fwd;
                    w += (last_bad < i);
                }
                break;
            case COMPLEMENTS:
                for (int64_t i = wlo; i < whi; ++i) {
                    const uint8_t b = buf[i + k - 1];
                    const uint64_t c = code_tab[b] & 3u;
                    fwd = ((fwd << 2) | c) & mask;
                    rc = (rc >> 2) | ((3ull - c) << rc_top);
                    if (!valid_tab[b]) last_bad = i + k - 1;
                    w[0] = fwd;
                    w[1] = rc;
                    w += 2 * (last_bad < i);
                }
                break;
            default:
                for (int64_t i = wlo; i < whi; ++i) {
                    const uint8_t b = buf[i + k - 1];
                    const uint64_t c = code_tab[b] & 3u;
                    fwd = ((fwd << 2) | c) & mask;
                    rc = (rc >> 2) | ((3ull - c) << rc_top);
                    if (!valid_tab[b]) last_bad = i + k - 1;
                    *w = fwd < rc ? fwd : rc;
                    w += (last_bad < i);
                }
        }
        out.resize(size_t(w - out.data()));
    });

    clk.lap("pack");
    int64_t total = 0;
    std::vector<int64_t> offs(T + 1, 0);
    for (int t = 0; t < T; ++t) {
        offs[t] = total;
        total += int64_t(parts[t].size());
    }
    offs[T] = total;

    if (total == 0) return 0;

    uint64_t* keys = (uint64_t*)malloc(size_t(total) * 8);
    uint64_t* tmp = (uint64_t*)malloc(size_t(total) * 8);
    if (!keys || !tmp) {
        free(keys);
        free(tmp);
        return -1;  // allocation failure: caller falls back
    }
    run_team(T, [&](int t) {
        memcpy(keys + offs[t], parts[t].data(), parts[t].size() * 8);
        parts[t] = {};  // release segment storage before the sort
    });

    clk.lap("concat");
    // ---- phase B: stable LSD radix over the occupied low bits
    radix_sort_u64(keys, tmp, total, 2 * k, T);
    free(tmp);
    clk.lap("sort");

    // ---- phase C: decode "<kmer>\n" rows (duplicates re-emitted as-is),
    // streamed through the callback in bounded slabs
    const int W = k + 1;
    const int J = (k + 7) / 8;            // 8-char LUT chunks per row
    const int64_t SLAB = 1 << 20;         // rows per emitted slab
    uint8_t* slab = (uint8_t*)malloc(size_t(SLAB) * W + 16);
    if (!slab) {
        free(keys);
        return -1;
    }
    // u16 (8 packed bases, MSB-first) -> 8 ASCII chars
    static_assert(sizeof(uint64_t) == 8, "");
    std::vector<uint8_t> lut(size_t(65536) * 8);
    for (uint32_t v = 0; v < 65536; ++v)
        for (int j = 0; j < 8; ++j)
            lut[size_t(v) * 8 + j] = decode_tab[(v >> (14 - 2 * j)) & 3];
    const int lshift = 64 - 2 * k;
    for (int64_t base = 0; base < total; base += SLAB) {
        const int64_t rows = std::min(SLAB, total - base);
        run_team(T, [&](int t) {
            const int64_t lo = rows * t / T, hi = rows * (t + 1) / T;
            const uint8_t* seg_end = slab + hi * W;
            for (int64_t i = lo; i < hi; ++i) {
                uint8_t* row = slab + i * W;
                const uint64_t kk = keys[base + i] << lshift;
                for (int j = 0; j < J; ++j) {
                    const uint16_t idx = uint16_t(kk >> (48 - 16 * j));
                    const uint8_t* src8 = &lut[size_t(idx) * 8];
                    if (row + 8 * j + 8 <= seg_end) {
                        // spill past byte k lands in this row's newline
                        // slot and later rows' heads — all rewritten
                        // afterwards by this same thread (rows ascend);
                        // near the segment edge the exact-width path
                        // keeps every write inside the segment, so
                        // threads never touch shared bytes
                        memcpy(row + 8 * j, src8, 8);
                    } else {
                        memcpy(row + 8 * j, src8, size_t(k - 8 * j));
                    }
                }
                row[k] = '\n';
            }
        });
        if (write_cb(slab, rows * W) < 0) {
            free(slab);
            free(keys);
            return -2;  // caller's stream failed; it re-raises
        }
    }
    clk.lap("decode");
    free(slab);
    free(keys);
    return total;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Two-word path: 32 < k <= 64 (the whole k-mer in a 128-bit lo/hi pair).
// Same phases and semantics as the single-word engine above; the key value
// is hi*2^64 + lo with the window-start base in the highest occupied bits,
// so numeric (hi, lo) order equals lexicographic base order.

namespace {

struct K2 {
    uint64_t lo, hi;
};

inline bool k2_less(const K2& a, const K2& b) {
    return a.hi != b.hi ? a.hi < b.hi : a.lo < b.lo;
}

// bits [s, s+14) of the 128-bit value, for the radix digit extraction
inline uint32_t k2_digit(const K2& v, int s, uint32_t dmask) {
    uint64_t x;
    if (s >= 64)
        x = v.hi >> (s - 64);
    else {
        x = v.lo >> s;
        if (s) x |= v.hi << (64 - s);
    }
    return uint32_t(x) & dmask;
}

void radix_sort_k2(K2* a, K2* tmp, int64_t n, int bits, int T) {
    constexpr int DIG = 14;
    constexpr int NB = 1 << DIG;
    const int passes = (bits + DIG - 1) / DIG;
    std::vector<std::vector<int64_t>> counts(T), starts(T);
    for (int t = 0; t < T; ++t) {
        counts[t].resize(NB);
        starts[t].resize(NB);
    }
    K2* src = a;
    K2* dst = tmp;
    for (int p = 0; p < passes; ++p) {
        const int shift = DIG * p;
        run_team(T, [&](int t) {
            auto& c = counts[t];
            std::fill(c.begin(), c.end(), 0);
            const int64_t lo = n * t / T, hi = n * (t + 1) / T;
            for (int64_t i = lo; i < hi; ++i)
                c[k2_digit(src[i], shift, NB - 1)]++;
        });
        int64_t off = 0;
        for (int d = 0; d < NB; ++d)
            for (int t = 0; t < T; ++t) {
                starts[t][d] = off;
                off += counts[t][d];
            }
        run_team(T, [&](int t) {
            int64_t* s = starts[t].data();
            const int64_t lo = n * t / T, hi = n * (t + 1) / T;
            for (int64_t i = lo; i < hi; ++i) {
                const K2 v = src[i];
                dst[s[k2_digit(v, shift, NB - 1)]++] = v;
            }
        });
        std::swap(src, dst);
    }
    if (src != a) memcpy(a, src, size_t(n) * sizeof(K2));
}

}  // namespace

extern "C" {

// Two-word variant of kstream_core_run for 32 < k <= 64; same contract.
int64_t kstream_core_run_w2(const uint8_t* buf, int64_t n, int k, int mode,
                            const uint8_t* code_tab,
                            const uint8_t* valid_tab,
                            const uint8_t* decode_tab, int threads,
                            ks_write_fn write_cb) {
    if (k <= 32 || k > 64 || n < k) return 0;
    const int64_t n_win = n - k + 1;
    int T = threads > 0 ? threads : 1;
    if (int64_t(T) > n_win) T = 1;
    PhaseClock clk;

    // ---- phase A: rolling 128-bit window keys
    const int hi_bits = 2 * k - 64;  // occupied bits of the hi word (>0)
    const uint64_t hi_mask =
        (hi_bits == 64) ? ~0ull : ((1ull << hi_bits) - 1);
    const int rc_top = hi_bits - 2;  // top base position within hi
    std::vector<std::vector<K2>> parts(T);
    run_team(T, [&](int t) {
        const int64_t wlo = n_win * t / T, whi = n_win * (t + 1) / T;
        auto& out = parts[t];
        out.resize(size_t(whi - wlo) * (mode == COMPLEMENTS ? 2 : 1));
        K2* w = out.data();
        uint64_t flo = 0, fhi = 0, rlo = 0, rhi = 0;
        int64_t last_bad = wlo - 1;
        auto step = [&](int64_t j) {
            const uint8_t b = buf[j];
            const uint64_t c = code_tab[b] & 3u;
            fhi = ((fhi << 2) | (flo >> 62)) & hi_mask;
            flo = (flo << 2) | c;
            rlo = (rlo >> 2) | (rhi << 62);
            rhi = (rhi >> 2) | ((3ull - c) << rc_top);
            if (!valid_tab[b]) last_bad = j;
        };
        for (int64_t j = wlo; j < wlo + k - 1; ++j) step(j);
        for (int64_t i = wlo; i < whi; ++i) {
            step(i + k - 1);
            const bool ok = last_bad < i;
            switch (mode) {
                case PLAIN:
                    *w = {flo, fhi};
                    w += ok;
                    break;
                case COMPLEMENTS:
                    w[0] = {flo, fhi};
                    w[1] = {rlo, rhi};
                    w += 2 * ok;
                    break;
                default: {
                    const K2 f{flo, fhi}, r{rlo, rhi};
                    *w = k2_less(r, f) ? r : f;
                    w += ok;
                }
            }
        }
        out.resize(size_t(w - out.data()));
    });

    clk.lap("pack");
    int64_t total = 0;
    std::vector<int64_t> offs(T + 1, 0);
    for (int t = 0; t < T; ++t) {
        offs[t] = total;
        total += int64_t(parts[t].size());
    }
    offs[T] = total;
    if (total == 0) return 0;

    K2* keys = (K2*)malloc(size_t(total) * sizeof(K2));
    K2* tmp = (K2*)malloc(size_t(total) * sizeof(K2));
    if (!keys || !tmp) {
        free(keys);
        free(tmp);
        return -1;
    }
    run_team(T, [&](int t) {
        memcpy(keys + offs[t], parts[t].data(),
               parts[t].size() * sizeof(K2));
        parts[t] = {};
    });

    clk.lap("concat");
    radix_sort_k2(keys, tmp, total, 2 * k, T);
    free(tmp);
    clk.lap("sort");

    // ---- phase C: slab-streamed decode.  The key shifted left so the
    // first base sits at the top of the 128-bit field: chunks 0-3 read
    // from the shifted hi word, 4-7 from the shifted lo word.
    const int W = k + 1;
    const int J = (k + 7) / 8;
    const int64_t SLAB = 1 << 20;
    uint8_t* slab = (uint8_t*)malloc(size_t(SLAB) * W + 16);
    if (!slab) {
        free(keys);
        return -1;
    }
    std::vector<uint8_t> lut(size_t(65536) * 8);
    for (uint32_t v = 0; v < 65536; ++v)
        for (int j = 0; j < 8; ++j)
            lut[size_t(v) * 8 + j] = decode_tab[(v >> (14 - 2 * j)) & 3];
    const int lshift = 128 - 2 * k;  // 0 <= lshift < 64
    for (int64_t base = 0; base < total; base += SLAB) {
        const int64_t rows = std::min(SLAB, total - base);
        run_team(T, [&](int t) {
            const int64_t lo = rows * t / T, hi = rows * (t + 1) / T;
            const uint8_t* seg_end = slab + hi * W;
            for (int64_t i = lo; i < hi; ++i) {
                uint8_t* row = slab + i * W;
                const K2 v = keys[base + i];
                uint64_t shi = v.hi, slo = v.lo;
                if (lshift) {
                    shi = (shi << lshift) | (slo >> (64 - lshift));
                    slo <<= lshift;
                }
                for (int j = 0; j < J; ++j) {
                    const uint64_t word = (j < 4) ? shi : slo;
                    const uint16_t idx =
                        uint16_t(word >> (48 - 16 * (j & 3)));
                    const uint8_t* src8 = &lut[size_t(idx) * 8];
                    if (row + 8 * j + 8 <= seg_end) {
                        memcpy(row + 8 * j, src8, 8);
                    } else {
                        memcpy(row + 8 * j, src8, size_t(k - 8 * j));
                    }
                }
                row[k] = '\n';
            }
        });
        if (write_cb(slab, rows * W) < 0) {
            free(slab);
            free(keys);
            return -2;
        }
    }
    clk.lap("decode");
    free(slab);
    free(keys);
    return total;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Multi-k path: several k-mer lengths in one sorted output stream (the
// reference CLI accepts `--kmers 20 21 ...`; its sorted output is the
// lexicographic merge of the per-k streams, where a shorter k-mer that is
// a prefix of a longer one sorts first — '\n' < 'A' in LC_ALL=C).
// Strategy: build each k's sorted key array as above, left-align every
// key to the top of a 128-bit field (prefix order becomes numeric order;
// a prefix tie leaves the aligned values equal and the shorter k wins),
// then one S-way merge decodes straight into output slabs.

namespace {

// Phase A for any k in 1..64: per-window K2 keys (right-aligned 2k bits,
// window-start base highest), validity-compacted, in window order
// (complements interleave fwd,rc per window).  Returns the key count, or
// -1 on allocation failure.
int64_t collect_window_keys(const uint8_t* buf, int64_t n, int k,
                            int mode, const uint8_t* code_tab,
                            const uint8_t* valid_tab, int T,
                            std::vector<K2>& out) {
    const int64_t n_win = n - k + 1;
    if (n_win <= 0) {
        out.clear();
        return 0;
    }
    if (int64_t(T) > n_win) T = 1;
    std::vector<std::vector<K2>> parts(T);
    if (k <= 32) {
        const uint64_t mask = (k == 32) ? ~0ull : ((1ull << (2 * k)) - 1);
        const int rc_top = 2 * (k - 1);
        run_team(T, [&](int t) {
            const int64_t wlo = n_win * t / T, whi = n_win * (t + 1) / T;
            auto& seg = parts[t];
            seg.resize(size_t(whi - wlo) * (mode == COMPLEMENTS ? 2 : 1));
            K2* w = seg.data();
            uint64_t fwd = 0, rc = 0;
            int64_t last_bad = wlo - 1;
            for (int64_t j = wlo; j < wlo + k - 1; ++j) {
                const uint8_t b = buf[j];
                const uint64_t c = code_tab[b] & 3u;
                fwd = ((fwd << 2) | c) & mask;
                rc = (rc >> 2) | ((3ull - c) << rc_top);
                if (!valid_tab[b]) last_bad = j;
            }
            for (int64_t i = wlo; i < whi; ++i) {
                const uint8_t b = buf[i + k - 1];
                const uint64_t c = code_tab[b] & 3u;
                fwd = ((fwd << 2) | c) & mask;
                rc = (rc >> 2) | ((3ull - c) << rc_top);
                if (!valid_tab[b]) last_bad = i + k - 1;
                const bool ok = last_bad < i;
                switch (mode) {
                    case PLAIN:
                        *w = {fwd, 0};
                        w += ok;
                        break;
                    case COMPLEMENTS:
                        w[0] = {fwd, 0};
                        w[1] = {rc, 0};
                        w += 2 * ok;
                        break;
                    default:
                        *w = {fwd < rc ? fwd : rc, 0};
                        w += ok;
                }
            }
            seg.resize(size_t(w - seg.data()));
        });
    } else {
        const int hi_bits = 2 * k - 64;
        const uint64_t hi_mask =
            (hi_bits == 64) ? ~0ull : ((1ull << hi_bits) - 1);
        const int rc_top = hi_bits - 2;
        run_team(T, [&](int t) {
            const int64_t wlo = n_win * t / T, whi = n_win * (t + 1) / T;
            auto& seg = parts[t];
            seg.resize(size_t(whi - wlo) * (mode == COMPLEMENTS ? 2 : 1));
            K2* w = seg.data();
            uint64_t flo = 0, fhi = 0, rlo = 0, rhi = 0;
            int64_t last_bad = wlo - 1;
            auto step = [&](int64_t j) {
                const uint8_t b = buf[j];
                const uint64_t c = code_tab[b] & 3u;
                fhi = ((fhi << 2) | (flo >> 62)) & hi_mask;
                flo = (flo << 2) | c;
                rlo = (rlo >> 2) | (rhi << 62);
                rhi = (rhi >> 2) | ((3ull - c) << rc_top);
                if (!valid_tab[b]) last_bad = j;
            };
            for (int64_t j = wlo; j < wlo + k - 1; ++j) step(j);
            for (int64_t i = wlo; i < whi; ++i) {
                step(i + k - 1);
                const bool ok = last_bad < i;
                switch (mode) {
                    case PLAIN:
                        *w = {flo, fhi};
                        w += ok;
                        break;
                    case COMPLEMENTS:
                        w[0] = {flo, fhi};
                        w[1] = {rlo, rhi};
                        w += 2 * ok;
                        break;
                    default: {
                        const K2 f{flo, fhi}, r{rlo, rhi};
                        *w = k2_less(r, f) ? r : f;
                        w += ok;
                    }
                }
            }
            seg.resize(size_t(w - seg.data()));
        });
    }
    int64_t total = 0;
    std::vector<int64_t> offs(T + 1, 0);
    for (int t = 0; t < T; ++t) {
        offs[t] = total;
        total += int64_t(parts[t].size());
    }
    out.clear();
    try {
        out.resize(size_t(total));
    } catch (...) {
        return -1;
    }
    if (total == 0) return 0;
    run_team(T, [&](int t) {
        memcpy(out.data() + offs[t], parts[t].data(),
               parts[t].size() * sizeof(K2));
        parts[t] = {};
    });
    return total;
}

// Sorted, LEFT-aligned (top-of-128-bit) keys for one k.  Returns the key
// count, or -1 on allocation failure.
int64_t build_sorted_aligned(const uint8_t* buf, int64_t n, int k,
                             int mode, const uint8_t* code_tab,
                             const uint8_t* valid_tab, int T,
                             std::vector<K2>& out) {
    const int64_t total = collect_window_keys(buf, n, k, mode, code_tab,
                                              valid_tab, T, out);
    if (total <= 0) return total;
    if (int64_t(T) > total) T = 1;
    K2* tmp = (K2*)malloc(size_t(total) * sizeof(K2));
    if (!tmp) return -1;
    radix_sort_k2(out.data(), tmp, total, 2 * k, T);
    free(tmp);
    const int s = 128 - 2 * k;  // left-align: prefix order = numeric order
    if (s) {
        run_team(T, [&](int t) {
            const int64_t lo = total * t / T, hi = total * (t + 1) / T;
            for (int64_t i = lo; i < hi; ++i) {
                K2& v = out[i];
                if (s >= 64) {
                    v.hi = v.lo << (s - 64);
                    v.lo = 0;
                } else {
                    v.hi = (v.hi << s) | (v.lo >> (64 - s));
                    v.lo <<= s;
                }
            }
        });
    }
    return total;
}

}  // namespace

// ---------------------------------------------------------------------------
// v2 path: the remaining CLI shapes — --split column output, --sort-cols
// permuted sort order, unsorted jobs, any validity table (--allow rides the
// caller-built table) — for one k in 1..64.  The reference reaches these
// shapes through its per-character Python pipeline + GNU sort -k columns
// (kstream.py:805-832 split, :66-74 sortPipe -k); here they are the same
// packed-key engine with (a) an optional bit-permuted key layout so ONE
// radix sort realizes `sort -t, -kC,C... ` + whole-line-tiebreak order, and
// (b) a column-aware decode that inserts the commas at fixed offsets.
//
// Key layout algebra: every output column is a contiguous bitfield of the
// right-aligned 2k-bit window key.  GNU sort's order (key columns first,
// then the whole line as last resort) equals numeric order of the key
// rebuilt as [sort columns | remaining columns in output order] — equal
// sort columns make the duplicate comparisons redundant, and fixed column
// widths make the comma positions align, so the ',' bytes never decide.

namespace {

inline K2 k2_shl(K2 a, int s) {
    if (s == 0) return a;
    if (s >= 64) return {0, s == 64 ? a.lo : a.lo << (s - 64)};
    return {a.lo << s, (a.hi << s) | (a.lo >> (64 - s))};
}

inline K2 k2_shr(K2 a, int s) {
    if (s == 0) return a;
    if (s >= 64) return {s == 64 ? a.hi : a.hi >> (s - 64), 0};
    return {(a.lo >> s) | (a.hi << (64 - s)), a.hi >> s};
}

inline K2 k2_or(K2 a, K2 b) { return {a.lo | b.lo, a.hi | b.hi}; }

inline K2 k2_mask_low(K2 a, int nbits) {  // keep the low nbits
    if (nbits >= 128) return a;
    if (nbits >= 64) {
        const int hb = nbits - 64;
        return {a.lo, hb ? (a.hi & ((1ull << hb) - 1)) : 0};
    }
    return {nbits ? (a.lo & ((1ull << nbits) - 1)) : 0, 0};
}

// left-aligned 16-bit chunk access per key type, for the shared decode
template <class K> struct V2Chunks;
template <> struct V2Chunks<uint64_t> {
    uint64_t s;
    V2Chunks(uint64_t v, int hi_bit)
        : s(hi_bit >= 64 ? v : v << (64 - hi_bit)) {}
    uint16_t chunk(int j) const { return uint16_t(s >> (48 - 16 * j)); }
};
template <> struct V2Chunks<K2> {
    K2 s;
    V2Chunks(K2 v, int hi_bit) : s(k2_shl(v, 128 - hi_bit)) {}
    uint16_t chunk(int j) const {
        const uint64_t w = (j < 4) ? s.hi : s.lo;
        return uint16_t(w >> (48 - 16 * (j & 3)));
    }
};

// Shared v2 decode+emit: column fields read at col_at offsets, commas at
// fixed positions, slab-streamed through write_cb.  ONE definition for
// the u64 and K2 shapes — only the chunk extraction differs (V2Chunks).
template <class K>
int64_t v2_decode_emit(const std::vector<K>& keys, int64_t total, int k,
                       const int32_t* col_len, const int32_t* col_at,
                       int n_cols, const uint8_t* decode_tab, int T,
                       ks_write_fn write_cb) {
    const int W = k + n_cols;  // bases + (n_cols-1) commas + newline
    const int64_t SLAB = 1 << 20;
    uint8_t* slab = (uint8_t*)malloc(size_t(SLAB) * W + 16);
    if (!slab) return -1;
    std::vector<uint8_t> lut(size_t(65536) * 8);
    for (uint32_t v = 0; v < 65536; ++v)
        for (int j = 0; j < 8; ++j)
            lut[size_t(v) * 8 + j] = decode_tab[(v >> (14 - 2 * j)) & 3];
    std::vector<int> chr0(n_cols);
    {
        int pos = 0;
        for (int c = 0; c < n_cols; ++c) {
            chr0[c] = pos;
            pos += col_len[c] + 1;  // ',' (or final '\n')
        }
    }
    for (int64_t base = 0; base < total; base += SLAB) {
        const int64_t rows = std::min(SLAB, total - base);
        run_team(T, [&](int t) {
            const int64_t lo = rows * t / T, hi = rows * (t + 1) / T;
            for (int64_t i = lo; i < hi; ++i) {
                uint8_t* row = slab + i * W;
                const K v = keys[base + i];
                for (int c = 0; c < n_cols; ++c) {
                    const int bl = col_len[c];
                    uint8_t* dst = row + chr0[c];
                    if (bl) {
                        const V2Chunks<K> s(v, 2 * (k - col_at[c]));
                        const int J = (bl + 7) / 8;
                        for (int j = 0; j < J; ++j) {
                            const uint16_t idx = s.chunk(j);
                            const int take = std::min(8, bl - 8 * j);
                            memcpy(dst + 8 * j, &lut[size_t(idx) * 8],
                                   size_t(take));
                        }
                    }
                    dst[bl] = (c + 1 < n_cols) ? ',' : '\n';
                }
            }
        });
        if (write_cb(slab, rows * W) < 0) {
            free(slab);
            return -2;
        }
    }
    free(slab);
    return total;
}

// u64 phase A for k <= 32 (the v2 single-word fast path — same loops as
// kstream_core_run's phase A, collected instead of streamed).  Returns
// the key count or -1 on allocation failure.
int64_t collect_window_keys_u64(const uint8_t* buf, int64_t n, int k,
                                int mode, const uint8_t* code_tab,
                                const uint8_t* valid_tab, int T,
                                std::vector<uint64_t>& out) {
    const int64_t n_win = n - k + 1;
    if (n_win <= 0) {
        out.clear();
        return 0;
    }
    if (int64_t(T) > n_win) T = 1;
    const uint64_t mask = (k == 32) ? ~0ull : ((1ull << (2 * k)) - 1);
    const int rc_top = 2 * (k - 1);
    std::vector<std::vector<uint64_t>> parts(T);
    run_team(T, [&](int t) {
        const int64_t wlo = n_win * t / T, whi = n_win * (t + 1) / T;
        auto& seg = parts[t];
        seg.resize(size_t(whi - wlo) * (mode == COMPLEMENTS ? 2 : 1));
        uint64_t* w = seg.data();
        uint64_t fwd = 0, rc = 0;
        int64_t last_bad = wlo - 1;
        for (int64_t j = wlo; j < wlo + k - 1; ++j) {
            const uint8_t b = buf[j];
            const uint64_t c = code_tab[b] & 3u;
            fwd = ((fwd << 2) | c) & mask;
            rc = (rc >> 2) | ((3ull - c) << rc_top);
            if (!valid_tab[b]) last_bad = j;
        }
        for (int64_t i = wlo; i < whi; ++i) {
            const uint8_t b = buf[i + k - 1];
            const uint64_t c = code_tab[b] & 3u;
            fwd = ((fwd << 2) | c) & mask;
            rc = (rc >> 2) | ((3ull - c) << rc_top);
            if (!valid_tab[b]) last_bad = i + k - 1;
            const bool ok = last_bad < i;
            switch (mode) {
                case PLAIN:
                    *w = fwd;
                    w += ok;
                    break;
                case COMPLEMENTS:
                    w[0] = fwd;
                    w[1] = rc;
                    w += 2 * ok;
                    break;
                default:
                    *w = fwd < rc ? fwd : rc;
                    w += ok;
            }
        }
        seg.resize(size_t(w - seg.data()));
    });
    int64_t total = 0;
    std::vector<int64_t> offs(T + 1, 0);
    for (int t = 0; t < T; ++t) {
        offs[t] = total;
        total += int64_t(parts[t].size());
    }
    out.clear();
    try {
        out.resize(size_t(total));
    } catch (...) {
        return -1;
    }
    if (total == 0) return 0;
    run_team(T, [&](int t) {
        memcpy(out.data() + offs[t], parts[t].data(),
               parts[t].size() * 8);
        parts[t] = {};
    });
    return total;
}

// u64 specialization of the v2 body for k <= 32: permute, sort, and
// decode all operate on single words (the radix moves half the bytes of
// the K2 path — measured ~2x on the split-shape bench).
int64_t run_v2_u64(const uint8_t* buf, int64_t n, int k, int mode,
                   int do_sort, const int32_t* col_src,
                   const int32_t* col_len, int n_cols,
                   const int32_t* col_dst, int permute,
                   const uint8_t* code_tab, const uint8_t* valid_tab,
                   const uint8_t* decode_tab, int T,
                   ks_write_fn write_cb, PhaseClock& clk) {
    std::vector<uint64_t> keys;
    const int64_t total = collect_window_keys_u64(buf, n, k, mode,
                                                  code_tab, valid_tab, T,
                                                  keys);
    if (total < 0) return -1;
    if (total == 0) return 0;
    if (int64_t(T) > total) T = 1;
    clk.lap("pack");

    if (do_sort && permute) {
        run_team(T, [&](int t) {
            const int64_t lo = total * t / T, hi = total * (t + 1) / T;
            for (int64_t i = lo; i < hi; ++i) {
                const uint64_t v = keys[i];
                uint64_t out = 0;
                for (int c = 0; c < n_cols; ++c) {
                    const int w = 2 * col_len[c];
                    if (!w) continue;
                    const int src_sh = 2 * (k - col_src[c] - col_len[c]);
                    const int dst_sh = 2 * (k - col_dst[c] - col_len[c]);
                    const uint64_t m =
                        (w == 64) ? ~0ull : ((1ull << w) - 1);
                    out |= ((v >> src_sh) & m) << dst_sh;
                }
                keys[i] = out;
            }
        });
        clk.lap("permute");
    }
    if (do_sort) {
        uint64_t* tmp = (uint64_t*)malloc(size_t(total) * 8);
        if (!tmp) return -1;
        radix_sort_u64(keys.data(), tmp, total, 2 * k, T);
        free(tmp);
        clk.lap("sort");
    }

    const int32_t* col_at = (do_sort && permute) ? col_dst : col_src;
    const int64_t got = v2_decode_emit(keys, total, k, col_len, col_at,
                                       n_cols, decode_tab, T, write_cb);
    clk.lap("decode");
    return got;
}

}  // namespace

extern "C" {

// One k (1..64), full shape surface:
//   do_sort   0 = emit in window order (unsorted jobs)
//   col_src   [n_cols] base offset of output column i within the k-mer
//   col_len   [n_cols] base length of output column i (may be 0)
//   col_dst   [n_cols] base offset of column i within the PERMUTED key
//   permute   1 = rebuild keys as the [sortcols|rest] layout before the
//             sort (decode then reads col_dst; otherwise col_src)
// The caller (kstream_vec.py) computes the column walk — including the
// reference's clamped front/back split arithmetic and the sort-column
// dedup — so this kernel only moves bits.  Same return contract as
// kstream_core_run; -3 = invalid arguments.
int64_t kstream_core_run_v2(const uint8_t* buf, int64_t n, int k, int mode,
                            int do_sort, const int32_t* col_src,
                            const int32_t* col_len, int n_cols,
                            const int32_t* col_dst, int permute,
                            const uint8_t* code_tab,
                            const uint8_t* valid_tab,
                            const uint8_t* decode_tab, int threads,
                            ks_write_fn write_cb) {
    if (k < 1 || k > 64 || n_cols < 1) return -3;
    {
        int64_t covered = 0;
        for (int c = 0; c < n_cols; ++c) {
            if (col_len[c] < 0 || col_src[c] < 0 ||
                col_src[c] + col_len[c] > k || col_dst[c] < 0 ||
                col_dst[c] + col_len[c] > k)
                return -3;
            covered += col_len[c];
        }
        if (covered != k) return -3;  // columns must partition the k-mer
    }
    if (n < k) return 0;
    int T = threads > 0 ? threads : 1;
    PhaseClock clk;
    if (k <= 32)
        return run_v2_u64(buf, n, k, mode, do_sort, col_src, col_len,
                          n_cols, col_dst, permute, code_tab, valid_tab,
                          decode_tab, T, write_cb, clk);

    std::vector<K2> keys;
    const int64_t total = collect_window_keys(buf, n, k, mode, code_tab,
                                              valid_tab, T, keys);
    if (total < 0) return -1;
    if (total == 0) return 0;
    if (int64_t(T) > total) T = 1;
    clk.lap("pack");

    if (do_sort && permute) {
        // rebuild each key in the [sortcols | rest] bit layout
        run_team(T, [&](int t) {
            const int64_t lo = total * t / T, hi = total * (t + 1) / T;
            for (int64_t i = lo; i < hi; ++i) {
                const K2 v = keys[i];
                K2 out{0, 0};
                for (int c = 0; c < n_cols; ++c) {
                    const int w = 2 * col_len[c];
                    if (!w) continue;
                    const int src_sh = 2 * (k - col_src[c] - col_len[c]);
                    const int dst_sh = 2 * (k - col_dst[c] - col_len[c]);
                    out = k2_or(out, k2_shl(
                        k2_mask_low(k2_shr(v, src_sh), w), dst_sh));
                }
                keys[i] = out;
            }
        });
        clk.lap("permute");
    }
    if (do_sort) {
        K2* tmp = (K2*)malloc(size_t(total) * sizeof(K2));
        if (!tmp) return -1;
        radix_sort_k2(keys.data(), tmp, total, 2 * k, T);
        free(tmp);
        clk.lap("sort");
    }

    // decode: column fields read from the current layout (shared
    // template — identical for the u64 fast path)
    const int32_t* col_at = (do_sort && permute) ? col_dst : col_src;
    const int64_t got = v2_decode_emit(keys, total, k, col_len, col_at,
                                       n_cols, decode_tab, T, write_cb);
    clk.lap("decode");
    return got;
}

}  // extern "C"

extern "C" {

// Multi-k variant: ks[0..nk) distinct lengths (each 1..64); the merged
// sorted stream of all per-k streams goes through write_cb.  Same return
// contract as kstream_core_run.
int64_t kstream_core_run_multi(const uint8_t* buf, int64_t n,
                               const int32_t* ks, int nk, int mode,
                               const uint8_t* code_tab,
                               const uint8_t* valid_tab,
                               const uint8_t* decode_tab, int threads,
                               ks_write_fn write_cb) {
    if (nk <= 0) return 0;
    for (int s = 0; s < nk; ++s)
        if (ks[s] < 1 || ks[s] > 64) return -3;  // invalid k: caller must
                                                 // fall back, not emit
                                                 // empty output as success
    int T = threads > 0 ? threads : 1;
    PhaseClock clk;

    std::vector<std::vector<K2>> streams(nk);
    int64_t total = 0;
    for (int s = 0; s < nk; ++s) {
        const int64_t got = build_sorted_aligned(
            buf, n, ks[s], mode, code_tab, valid_tab, T, streams[s]);
        if (got < 0) return -1;
        total += got;
    }
    clk.lap("build");
    if (total == 0) return 0;

    std::vector<uint8_t> lut(size_t(65536) * 8);
    for (uint32_t v = 0; v < 65536; ++v)
        for (int j = 0; j < 8; ++j)
            lut[size_t(v) * 8 + j] = decode_tab[(v >> (14 - 2 * j)) & 3];

    const int64_t CAP = 1 << 25;  // slab bytes
    uint8_t* slab = (uint8_t*)malloc(size_t(CAP) + 80);
    if (!slab) return -1;
    int64_t used = 0;
    std::vector<int64_t> head(nk, 0);
    for (int64_t emitted = 0; emitted < total; ++emitted) {
        int best = -1;
        for (int s = 0; s < nk; ++s) {
            if (head[s] >= int64_t(streams[s].size())) continue;
            if (best < 0) {
                best = s;
                continue;
            }
            const K2& a = streams[s][head[s]];
            const K2& b = streams[best][head[best]];
            // aligned numeric order; on a full prefix tie (equal aligned
            // values) the shorter k-mer sorts first ('\n' < 'A')
            if (a.hi != b.hi ? a.hi < b.hi
                : a.lo != b.lo ? a.lo < b.lo : ks[s] < ks[best])
                best = s;
        }
        const int k = ks[best];
        const K2 v = streams[best][head[best]++];
        uint8_t* row = slab + used;
        const int J = (k + 7) / 8;
        for (int j = 0; j < J; ++j) {
            const uint64_t word = (j < 4) ? v.hi : v.lo;
            const uint16_t idx = uint16_t(word >> (48 - 16 * (j & 3)));
            memcpy(row + 8 * j, &lut[size_t(idx) * 8], 8);
        }
        row[k] = '\n';
        used += k + 1;
        if (used + 80 > CAP) {
            if (write_cb(slab, used) < 0) {
                free(slab);
                return -2;
            }
            used = 0;
        }
    }
    if (used && write_cb(slab, used) < 0) {
        free(slab);
        return -2;
    }
    clk.lap("merge");
    free(slab);
    return total;
}

}  // extern "C"
