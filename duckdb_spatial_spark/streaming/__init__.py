from .ops import (  # noqa: F401
    streaming_dedup_exact,
    streaming_hamming_dedup,
    streaming_count_min,
    streaming_hll,
    streaming_neardup_dedup,
    streaming_extent_agg,
    streaming_index_append,
    streaming_point_filter,
    streaming_session_extents,
    streaming_spatial_join,
    streaming_interval_join,
)
