"""Structured Streaming spatial operators (SURVEY §2.J note: the reference
has no streaming; this is the Spark-native extension the model classification
§1.5 predicted is nearly free).

Every scalar ST_* function is stateless → usable in a stream unchanged.
``ST_Extent_Agg`` decomposes into min/max → watermark-compatible windowed
aggregation with no custom state store.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_point_filter(stream: DataFrame, x: str, y: str,
                           xmin: float, ymin: float, xmax: float, ymax: float,
                           strict: bool = True) -> DataFrame:
    """Envelope filter on a stream — same col-expr as the batch fast path."""
    from ..functions.scalar import st_point_in_box

    return stream.filter(st_point_in_box(x, y, xmin, ymin, xmax, ymax, strict=strict))


def streaming_extent_agg(
    stream: DataFrame,
    ts_col: str,
    x: str,
    y: str,
    window: str = "5 minutes",
    slide: str = None,
    watermark: str = "10 minutes",
    group_cols=(),
) -> DataFrame:
    """Windowed bbox aggregation over a point stream: the streaming form of
    ST_Extent_Agg (decomposable min/max ⇒ append-mode safe with watermark)."""
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("window"), *group_cols)
        .agg(
            F.min(x).alias("xmin"),
            F.min(y).alias("ymin"),
            F.max(x).alias("xmax"),
            F.max(y).alias("ymax"),
            F.count("*").alias("n"),
        )
    )
