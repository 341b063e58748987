// Native FASTA ingest: line-unwrapping + 2-bit packing.
//
// TPU-native equivalent of the reference's parallel FASTA parsing hot path
// (FastaIndex::getmydna, reference src/FastaIndex.cpp:191-290): each record's
// ASCII bases are gathered across fixed-width lines and mapped to 2-bit codes
// (A/a->0 C/c->1 G/g->2 T/t->3, everything else->0, matching
// DnaSeq.hpp:136-154).  OpenMP-parallel over records.
//
// Exposed with a plain C ABI for ctypes.

#include <cstdint>
#include <cstring>

static unsigned char CODE_LUT[256];

namespace {
struct LutInit {
    LutInit() {
        memset(CODE_LUT, 0, sizeof(CODE_LUT));
        CODE_LUT[(unsigned char)'C'] = CODE_LUT[(unsigned char)'c'] = 1;
        CODE_LUT[(unsigned char)'G'] = CODE_LUT[(unsigned char)'g'] = 2;
        CODE_LUT[(unsigned char)'T'] = CODE_LUT[(unsigned char)'t'] = 3;
    }
};
static LutInit lut_init;
}  // namespace

extern "C" {

// Unwrap + pack records from a raw FASTA byte range.
//   raw:        the file bytes starting at file offset `startpos`
//   nrecords:   number of records
//   lens:       record sequence lengths
//   poss:       file offset of each record's first base
//   line_bases: bases per line for each record
//   offsets:    output offset of each record in `codes`
//   codes:      output per-base 2-bit codes (1 byte per base)
void fasta_unwrap_pack(const char* raw, int64_t startpos, int64_t nrecords,
                       const int64_t* lens, const int64_t* poss,
                       const int64_t* line_bases, const int64_t* offsets,
                       unsigned char* codes) {
#pragma omp parallel for schedule(dynamic, 64)
    for (int64_t i = 0; i < nrecords; ++i) {
        const char* src = raw + (poss[i] - startpos);
        unsigned char* dst = codes + offsets[i];
        int64_t remain = lens[i];
        int64_t width = line_bases[i];
        while (remain > 0) {
            int64_t cnt = remain < width ? remain : width;
            for (int64_t j = 0; j < cnt; ++j)
                dst[j] = CODE_LUT[(unsigned char)src[j]];
            dst += cnt;
            src += cnt + 1;  // skip the newline
            remain -= cnt;
        }
    }
}

// Pack per-base codes (1B/base) into 4 bases/byte MSB-first
// (DnaSeq.cpp:48-54 layout).
void pack_2bit(const unsigned char* codes, int64_t n, unsigned char* out) {
    int64_t nb = n / 4;
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < nb; ++i) {
        const unsigned char* c = codes + 4 * i;
        out[i] = (unsigned char)((c[0] << 6) | (c[1] << 4) | (c[2] << 2) | c[3]);
    }
    if (n % 4) {
        unsigned char b = 0;
        for (int64_t j = 0; j < n % 4; ++j)
            b |= (unsigned char)(codes[4 * nb + j] << (6 - 2 * j));
        out[nb] = b;
    }
}

// Reverse complement of a code array.
void revcomp_codes(const unsigned char* codes, int64_t n, unsigned char* out) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) out[i] = (unsigned char)(3 - codes[n - 1 - i]);
}

}  // extern "C"

// PAF line formatting: the reference writes PAF via per-rank ostringstream +
// MPI_File_write_ordered (main.cpp:514-551); formatting millions of lines in
// Python is the bottleneck, so the hot formatter is native.
// Fields per entry (ints): lenQ begQ endQ rc lenT begT endT score passed.
// Names are passed as a preconcatenated blob with offsets.
extern "C" int64_t format_paf(
    const int64_t* qid, const int64_t* tid, int64_t n,
    const int32_t* lenQ, const int32_t* begQ, const int32_t* endQ,
    const uint8_t* rc, const int32_t* lenT, const int32_t* begT,
    const int32_t* endT, const int32_t* score, const uint8_t* passed,
    const char* names, const int64_t* name_off, char* out,
    int64_t out_cap) {
    int64_t w = 0;
    auto put_int = [&](int64_t v) {
        char buf[24];
        int len = 0;
        if (v == 0) buf[len++] = '0';
        bool neg = v < 0;
        if (neg) v = -v;
        while (v > 0) { buf[len++] = (char)('0' + v % 10); v /= 10; }
        if (neg) buf[len++] = '-';
        for (int i = len - 1; i >= 0; --i) out[w++] = buf[i];
    };
    auto put_name = [&](int64_t id) {
        int64_t b = name_off[id], e = name_off[id + 1];
        memcpy(out + w, names + b, (size_t)(e - b));
        w += e - b;
    };
    for (int64_t i = 0; i < n; ++i) {
        if (w + 256 > out_cap) return -1;
        put_name(qid[i]); out[w++] = '\t';
        put_int(lenQ[i]); out[w++] = '\t';
        put_int(begQ[i]); out[w++] = '\t';
        put_int(endQ[i]); out[w++] = '\t';
        out[w++] = rc[i] ? '-' : '+'; out[w++] = '\t';
        put_name(tid[i]); out[w++] = '\t';
        put_int(lenT[i]); out[w++] = '\t';
        put_int(begT[i]); out[w++] = '\t';
        put_int(endT[i]); out[w++] = '\t';
        put_int(score[i]); out[w++] = '\t';
        int32_t maplen = endQ[i] - begQ[i] > 0 ? endQ[i] - begQ[i] : 0;
        put_int(maplen); out[w++] = '\t';
        out[w++] = '2'; out[w++] = '5'; out[w++] = '5'; out[w++] = '\t';
        out[w++] = passed[i] ? '1' : '0';
        out[w++] = '\n';
    }
    return w;
}
