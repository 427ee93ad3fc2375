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

from ..operators import text as TX


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


def incremental_dedup_stream(
    docs: DataFrame,
    prior_fps: DataFrame,
    text_col: str = "text",
    time_col: str = "ts",
    watermark: str = "1 hour",
    streaming: bool = True,
) -> DataFrame:
    """Streaming ingest dedup AGAINST A PRIOR SNAPSHOT — the streaming
    twin of operators/dedup.incremental_dedup: documents whose
    normalized fingerprint already exists in the (static, distinct-fp)
    snapshot index are dropped via a stream-static LEFT ANTI join, and
    survivors dedupe within the stream first-arrival-wins under the
    watermark horizon.

    The static side is the same materialized fp index the batch path
    uses (write it bucketed by fp once per snapshot); Spark re-plans the
    stream-static join per micro-batch, so publishing a NEW snapshot
    index is a metadata swap, not a stream restart. State: only the
    within-stream dedup keys younger than the watermark — membership
    against the 100 TB history lives in the join, not in state."""
    fp = TX.fingerprint(F.col(text_col))
    src = docs.withColumn("_fp", fp)
    idx = prior_fps.select(F.col("fp").alias("_fp"))
    unseen = src.join(idx, "_fp", "left_anti")
    if streaming:
        out = unseen.withWatermark(
            time_col, watermark
        ).dropDuplicatesWithinWatermark(["_fp"])
    else:
        out = unseen.dropDuplicates(["_fp"])
    return out.drop("_fp")
