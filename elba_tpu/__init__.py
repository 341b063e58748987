"""elba-tpu: a TPU-native distributed sparse-semiring framework and de novo
long-read genome assembler.

Brand-new design (not a port) with the capabilities of PASSIONLab/ELBA
(reference layout documented in SURVEY.md).  The assembly pipeline is
expressed as sparse linear algebra over custom semirings on a 2D JAX device
mesh:

  reads --2bit pack--> k-mer extraction --> reliable k-mer set (exact
  sort-based counting; cf. reference KmerOps.cpp:18-350) --> sparse matrix A
  (reads x kmers) --> B = A @ A.T under the SharedSeeds semiring (sort-join
  SpGEMM; cf. SharedSeeds.cpp:4-10) --> batched X-drop seed-and-extend
  alignment (cf. XDropAligner.cpp:232-282) --> overlap graph R --> transitive
  reduction (min-plus semiring SpGEMM; cf. TransitiveReduction.cpp:45-80)
  --> string graph S --> connected components + contig chains
  (cf. ContigGeneration.cpp:347-461).

Everything on-device uses static shapes, sorts, and segment reductions --
the TPU-native substitute for the reference's hash maps and dynamic sparse
accumulators.
"""

import jax

# The packed k-mer representation uses uint64 keys (k <= 32) and the sparse
# joins use 64-bit composite (row, col) keys, so 64-bit types must be enabled
# before any tracing happens.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
