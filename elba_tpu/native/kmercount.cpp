// Native reliable-k-mer counting: canonical extraction + parallel stable
// sort + run-length filter.
//
// TPU-native framework equivalent of the reference's k-mer counting hot
// path (KmerOps::get_kmer_count_map_keys/values, reference
// src/KmerOps.cpp:18-340, and the DEDUKT GPU counter hook,
// .gitmodules:1-6).  Single-word canonical k-mers (k <= 32) are extracted
// with the rolling update the reference uses (Kmer::GetExtension /
// GetTwin, src/Kmer.cpp:150-205), sorted by (kmer, readid, pos) with a
// parallel stable sort, and reduced to the reliable set
// (lower <= count <= upper) -- the exact same set as the reference's
// Bloom + two-pass construction (SURVEY.md section 7.3).
//
// Plain C ABI for ctypes.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#include <parallel/algorithm>
#define STABLE_SORT __gnu_parallel::stable_sort
#else
#define STABLE_SORT std::stable_sort
#endif

namespace {
struct Inst {
    uint64_t key;   // canonical packed k-mer (base 0 in high bits)
    int64_t tag;    // readid << 32 | pos
};
}  // namespace

extern "C" {

// codes:    concatenated 2-bit codes, one byte per base
// offsets:  int64[nreads + 1] read boundaries in `codes`
// Returns the number of kept instances (written to out_*), and the number
// of reliable k-mers via *out_nkmers.  Output arrays must be sized for
// the worst case (total windows); out_kmers likewise.
int64_t kmer_count_reliable(const uint8_t* codes, const int64_t* offsets,
                            int64_t nreads, int64_t k,
                            int64_t lower, int64_t upper,
                            int64_t* out_rows, int64_t* out_cols,
                            int32_t* out_pos, uint64_t* out_kmers,
                            int64_t* out_nkmers) {
    // per-read window counts -> instance array offsets
    std::vector<int64_t> woff(nreads + 1, 0);
    for (int64_t r = 0; r < nreads; ++r) {
        int64_t len = offsets[r + 1] - offsets[r];
        woff[r + 1] = woff[r] + (len >= k ? len - k + 1 : 0);
    }
    const int64_t total = woff[nreads];
    std::vector<Inst> inst(total);

    const uint64_t kshift = 2 * (uint64_t)(k - 1);
    const uint64_t mask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);

#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic, 64)
#endif
    for (int64_t r = 0; r < nreads; ++r) {
        const uint8_t* s = codes + offsets[r];
        int64_t len = offsets[r + 1] - offsets[r];
        if (len < k) continue;
        uint64_t fwd = 0, rc = 0;
        for (int64_t i = 0; i < k; ++i) {
            fwd = (fwd << 2) | s[i];
            rc |= (uint64_t)(3 - s[i]) << (2 * i);
        }
        Inst* out = inst.data() + woff[r];
        int64_t w = len - k + 1;
        for (int64_t p = 0;;) {
            uint64_t canon = fwd < rc ? fwd : rc;
            out[p].key = canon;
            out[p].tag = ((int64_t)r << 32) | (int64_t)p;
            if (++p >= w) break;
            uint64_t c = s[p + k - 1];
            fwd = ((fwd << 2) | c) & mask;
            rc = (rc >> 2) | ((3 - c) << kshift);
        }
    }

    // stable sort by key keeps the (readid, pos) row-major order within
    // each k-mer group -- the canonical instance order (kmers/count.py)
    STABLE_SORT(inst.begin(), inst.end(),
                [](const Inst& a, const Inst& b) { return a.key < b.key; });

    // run-length filter + emit
    int64_t nk = 0, kept = 0;
    for (int64_t i = 0; i < total;) {
        int64_t j = i + 1;
        while (j < total && inst[j].key == inst[i].key) ++j;
        int64_t c = j - i;
        if (c >= lower && c <= upper) {
            out_kmers[nk] = inst[i].key;
            for (int64_t t = i; t < j; ++t) {
                out_rows[kept] = inst[t].tag >> 32;
                out_cols[kept] = nk;
                out_pos[kept] = (int32_t)(inst[t].tag & 0xffffffff);
                ++kept;
            }
            ++nk;
        }
        i = j;
    }
    *out_nkmers = nk;
    return kept;
}

}  // extern "C"
