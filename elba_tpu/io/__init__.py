from .paf import write_paf, paf_lines
from .fasta_out import write_contigs_fasta
