from .ops import streaming_extent_agg, streaming_point_filter  # noqa: F401
