"""K-mer analysis layer: windowed extraction, canonicalization, exact
reliable-k-mer counting, and construction of the reads-by-kmers sparse
matrix A.

Replaces the reference's Kmer/KmerOps/HyperLogLog/Bloom stack
(reference include/Kmer.hpp, include/KmerOps.hpp, src/KmerOps.cpp) with
device-side vectorized packing and sort-based exact counting.  With
LOWER_KMER_FREQ >= 2 the Bloom filter in the reference is a memory
optimization, not semantics: a k-mer's final presence depends only on its
true global count in [L, U] (see SURVEY.md section 7.3), so exact counting
yields the same reliable k-mer set.
"""

from .extract import extract_canonical_kmers, pack_kmers_ref
from .count import count_reliable_kmers, build_kmer_matrix, KmerMatrix
