"""Graph layer: overlap-graph pruning, transitive reduction, connected
components, and contig generation (reference L6: TransitiveReduction,
CC.hpp, ContigGeneration).
"""

from .prune import find_bad_reads, find_contained_reads, prune_overlap_graph
from .tr import transitive_reduction, overlap_transpose_values
from .cc import connected_components
from .contigs import generate_contigs
