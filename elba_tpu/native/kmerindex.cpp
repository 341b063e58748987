// Native genome k-mer index for the assembly evaluator
// (tools/eval_assembly.py, the QUAST role of the reference's
// script/analysis.sh): rolling forward-strand packing + parallel stable
// sort by (k-mer, position).  Stable order keeps the lowest genome
// position first among equal k-mers, which is the evaluator's
// first-occurrence anchoring rule.
//
// Plain C ABI for ctypes.

#include <algorithm>
#include <cstdint>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#include <parallel/algorithm>
#define STABLE_SORT __gnu_parallel::stable_sort
#else
#define STABLE_SORT std::stable_sort
#endif

namespace {
struct KPos {
    uint64_t key;
    int64_t pos;
};
}  // namespace

extern "C" {

// codes: uint8[n] 2-bit base codes; writes n-k+1 sorted (key, pos) pairs.
void genome_kmer_index(const uint8_t* codes, int64_t n, int64_t k,
                       uint64_t* out_keys, int64_t* out_pos) {
    const int64_t total = n - k + 1;
    if (total <= 0) return;
    std::vector<KPos> inst(total);
    const uint64_t mask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
#if defined(_OPENMP)
#pragma omp parallel
    {
        const int tid = omp_get_thread_num();
        const int nt = omp_get_num_threads();
        const int64_t lo = total * tid / nt, hi = total * (tid + 1) / nt;
#else
    {
        const int64_t lo = 0, hi = total;
#endif
        if (lo < hi) {
            uint64_t key = 0;
            for (int64_t j = 0; j < k - 1; ++j)
                key = (key << 2) | codes[lo + j];
            for (int64_t p = lo; p < hi; ++p) {
                key = ((key << 2) | codes[p + k - 1]) & mask;
                inst[p].key = key;
                inst[p].pos = p;
            }
        }
    }
    STABLE_SORT(inst.begin(), inst.end(), [](const KPos& a, const KPos& b) {
        return a.key < b.key || (a.key == b.key && a.pos < b.pos);
    });
#if defined(_OPENMP)
#pragma omp parallel for
#endif
    for (int64_t i = 0; i < total; ++i) {
        out_keys[i] = inst[i].key;
        out_pos[i] = inst[i].pos;
    }
}

}  // extern "C"
