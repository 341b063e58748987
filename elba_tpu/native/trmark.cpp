// Native transitive-reduction marking: the masked min-plus SpGEMM test
// of elba_tpu/graph/tr.py:_transitive_mask, without materializing the
// product list.
//
// Framework equivalent of the reference's TransitiveReduction marking
// multiply (reference src/TransitiveReduction.cpp:45-80: N = S.S under the
// direction-composing min-plus semiring, then I = EWiseApply(F, N,
// suffix+FUZZ >= N.suffix_paths[dir])).  Only products landing on S's own
// nonzero positions can mark an edge, so each 2-path (i -> v -> j) is
// looked up directly in S's col-major structure and tested in place.
//
// Input edge arrays are in the COOMatrix canonical order (sorted by
// (col, row)), so the col groups are contiguous and rows are strictly
// increasing within each group; a counting sort over rows gives the
// row-grouped view.  For each middle vertex v and each right edge
// (v -> j), the left candidates (i -> v) and the target col group (col j)
// are both row-sorted, so the product test is a two-pointer sorted
// intersection -- O(deg_in(v) + deg_col(j)) per right edge, no binary
// searches, no product materialization.  Marks are idempotent uint8
// stores (benign race under OpenMP).
//
// Plain C ABI for ctypes.

#include <cstdint>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// rows/cols: int64[nnz] in canonical (col-major) order
// dirs:      int8[nnz]  2-bit direction code, -1 = invalid
// suffix:    int32[nnz] suffix lengths
// fuzz:      marking slack (reference TransitiveReduction.cpp FUZZ)
// out_mark:  uint8[nnz], caller-zeroed; set to 1 where transitive
void tr_mark(const int64_t* rows, const int64_t* cols, const int8_t* dirs,
             const int32_t* suffix, int64_t nnz, int64_t n, int32_t fuzz,
             uint8_t* out_mark) {
    if (nnz == 0) return;
    // col group pointers from the canonically-sorted cols array
    std::vector<int64_t> col_ptr(n + 1, 0);
    for (int64_t e = 0; e < nnz; ++e) col_ptr[cols[e] + 1]++;
    for (int64_t c = 0; c < n; ++c) col_ptr[c + 1] += col_ptr[c];
    // row-grouped view (counting sort by row; within a row group the
    // edge order is irrelevant -- marks are ORed)
    std::vector<int64_t> row_ptr(n + 1, 0);
    for (int64_t e = 0; e < nnz; ++e) row_ptr[rows[e] + 1]++;
    for (int64_t r = 0; r < n; ++r) row_ptr[r + 1] += row_ptr[r];
    std::vector<int64_t> row_idx(nnz);
    {
        std::vector<int64_t> cur(row_ptr.begin(), row_ptr.end() - 1);
        for (int64_t e = 0; e < nnz; ++e) row_idx[cur[rows[e]]++] = e;
    }

#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic, 256)
#endif
    for (int64_t v = 0; v < n; ++v) {
        const int64_t ls = col_ptr[v], le = col_ptr[v + 1];   // left: i -> v
        if (ls == le) continue;
        const int64_t rs = row_ptr[v], re = row_ptr[v + 1];   // right: v -> j
        for (int64_t rj = rs; rj < re; ++rj) {
            const int64_t r = row_idx[rj];
            const int8_t dr = dirs[r];
            if (dr < 0) continue;
            const int8_t t2r = (dr >> 1) & 1;    // left h1 must differ
            const int64_t j = cols[r];
            int64_t t = col_ptr[j], te = col_ptr[j + 1];
            if (t == te) continue;
            const int32_t sr = suffix[r];
            // two-pointer intersection: rows[l] (l in [ls,le)) vs
            // rows[t] (t in [t,te)), both strictly increasing
            int64_t l = ls;
            while (l < le && t < te) {
                const int64_t rl = rows[l], rt = rows[t];
                if (rl < rt) { ++l; }
                else if (rl > rt) { ++t; }
                else {
                    const int8_t dl = dirs[l];
                    if (dl >= 0 && (dl & 1) != t2r) {
                        const int8_t slot =
                            (int8_t)(2 * ((dl >> 1) & 1) + (dr & 1));
                        if (dirs[t] == slot &&
                            suffix[t] + fuzz >= suffix[l] + sr)
                            out_mark[t] = 1;
                    }
                    ++l; ++t;
                }
            }
        }
    }
}

}  // extern "C"
