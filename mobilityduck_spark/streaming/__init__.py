"""Structured Streaming operators.

The reference has no streaming surface (SURVEY.md §2.0: none in tests,
queries, or source); these are the Spark-native extensions that fall out
of expression-based operators: the same span/temporal column functions
compose with readStream → watermark → window/session_window →
writeStream unchanged.
"""

from .heavy_hitters import streaming_heavy_hitters
from .kmv import streaming_kmv_distinct
from .joins import enrich_with_dim, interval_self_join
from .windows import (
    session_spans_stream,
    sliding_window_stats,
    tumbling_value_spans,
)

__all__ = [
    "streaming_heavy_hitters",
    "streaming_kmv_distinct",
    "sliding_window_stats",
    "session_spans_stream",
    "tumbling_value_spans",
    "enrich_with_dim",
    "interval_self_join",
]
