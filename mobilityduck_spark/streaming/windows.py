"""Streaming window operators over event streams.

Works on both batch and streaming DataFrames (the transformations are
identical; streaming adds the watermark). Tests drive them with a batch
source and with readStream+memory sink (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import span as S


def sliding_window_stats(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
    streaming: bool = True,
) -> DataFrame:
    """Per (window, event_type): count + value stats. Watermark bounds
    state for late data."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window, slide), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("window.start").alias("wstart"),
            F.col("window.end").alias("wend"),
            "event_type",
            "n",
            "sum_value",
            "max_value",
        )
    )


def session_spans_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    streaming: bool = True,
) -> DataFrame:
    """Session windows per user — the streaming twin of the batch
    sessions_spanset operator (spanset-merge semantics implemented by
    session_window)."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("sstart"),
            F.col("session_window.end").alias("send"),
            "n_events",
        )
    )


def tumbling_value_spans(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    streaming: bool = True,
) -> DataFrame:
    """Per (user, window): the value-span (min..max hull) of the window —
    temporal-type output (a span struct) from a streaming aggregate,
    demonstrating that the struct encodings survive streaming exchanges."""
    src = events.withWatermark("ts", watermark) if streaming else events
    return (
        src.groupBy(F.window("ts", window), "user_id")
        .agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
        .select(
            "user_id",
            F.col("window.start").alias("wstart"),
            S.span(F.col("vmin"), F.col("vmax"), F.lit(True), F.lit(True)).alias(
                "value_span"
            ),
        )
    )
