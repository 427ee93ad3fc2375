"""Streaming deduplication — the training-data pipeline's dedup stage
in Structured-Streaming form.

Exact dedup over an unbounded document stream: content-hash (md5, same
key as operators/dedup.dedup_exact) + `dropDuplicatesWithinWatermark`,
so dedup state is bounded by the watermark horizon instead of growing
with the corpus. At ingest scale you size the horizon to the dedup SLA
(e.g. "no duplicate re-emitted within 24 h"), not to corpus size — a
duplicate arriving after the horizon can re-emit and is caught by the
periodic batch dedup pass (operators/dedup.py), which is the standard
lambda split for 100 TB-scale ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    time_col: str = "ts",
    watermark: str = "1 hour",
    streaming: bool = True,
) -> DataFrame:
    """First-arrival-wins exact dedup keyed on the md5 content hash.

    `streaming=True` requires an event-time column (`time_col`) and
    bounds state with `dropDuplicatesWithinWatermark`; `streaming=False`
    runs the same transform as a batch `dropDuplicates` (one row kept
    per hash), matching operators/dedup.dedup_exact's key."""
    src = docs.withColumn("_h", F.md5(F.col(text_col)))
    if streaming:
        out = src.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
            ["_h"]
        )
    else:
        out = src.dropDuplicates(["_h"])
    return out.drop("_h")
