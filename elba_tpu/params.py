"""Runtime parameters for the assembly pipeline.

The reference fixes KMER_SIZE / LOWER_KMER_FREQ / UPPER_KMER_FREQ at compile
time (reference include/compiletime.h:1-24, Makefile:1-7) because
UPPER_KMER_FREQ sizes fixed C arrays.  Here they are runtime values: the
TPU implementation sizes its padded buffers dynamically per run (shapes are
still static *within* a compiled step).

CLI-visible alignment parameters mirror the reference defaults
(reference src/main.cpp:50-61): mat=1, mis=-1, gap=-1, xdrop=15,
bad_read_cutoff=0.65, output_prefix='elba'.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PipelineParams:
    # --- k-mer selection (reference compiletime.h:10,21) ---
    k: int = 31                 # 2 < k < 96 and odd, matching the reference's full Kmer<1|2|3> range (Kmer.hpp:95-97)
    lower_freq: int = 15        # LOWER_KMER_FREQ: keep k-mers with count >= lower
    upper_freq: int = 35        # UPPER_KMER_FREQ: keep k-mers with count <= upper

    # --- alignment scoring (reference main.cpp:50-56) ---
    mat: int = 1
    mis: int = -1
    gap: int = -1
    xdrop: int = 15

    # --- overlap-graph pruning (reference main.cpp:61) ---
    bad_read_cutoff: float = 0.65

    # --- output ---
    output_prefix: str = "elba"

    # --- TPU kernel shape knobs (no reference equivalent; tuning only) ---
    max_band: int = 256         # static antidiagonal band width for the X-drop kernel
    align_batch: int = 512      # pairs per alignment kernel launch

    def __post_init__(self):
        if not (2 < self.k < 96):
            raise ValueError(f"k must be in (2, 96), got {self.k}")
        if self.k % 2 == 0:
            raise ValueError(f"k must be odd (strand detection uses the middle base), got {self.k}")
        if not (0 < self.lower_freq <= self.upper_freq <= 65535):
            raise ValueError(
                f"need 0 < lower <= upper <= 65535, got {self.lower_freq}, {self.upper_freq}")


# Mirrors FUZZ in reference TransitiveReduction.hpp:15.
TR_FUZZ = 1000

# Mirrors DELTACHERNOFF in reference XDropAligner.hpp:9.
DELTA_CHERNOFF = 0.1

# Minimum overlap length accepted by the alignment classifier
# (reference XDropAligner.cpp:32).
MIN_OVERLAP_LEN = 500
