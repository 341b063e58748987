from .segments import (
    segment_boundaries,
    segment_ids_from_boundaries,
    segment_starts_counts,
    expand_cross_products,
    expand_join_products,
)
