"""Streaming time-weighted average: the stateful-streaming twin of
events.time_weighted_avg.

Per key, the state is (last_ts, last_value_micro, wsum_str, dur_us):
each arriving sample CLOSES the previous sample's holding interval
(adding value x duration to the exact accumulator) and opens its own.
wsum can exceed int64 on long streams, so it rides state as a decimal
STRING (Python int arithmetic is exact at any width — the streaming
analog of the batch operator's DECIMAL(38,0) sums). Each micro-batch
that extends a key emits the key's updated running TWAP, so the sink
always holds the value the batch operator would compute over the
prefix replayed so far.

Scale shape: one fixed-width tuple of state per live key; per batch,
each key sorts only its own rows.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key long, n_events long, dur_us long, twap_micro long"
STATE_SCHEMA = "last_ts long, last_vu long, wsum string, dur_us long, n long"


def _update(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.exists:
        last_ts, last_vu, wsum_s, dur, n = state.get
        wsum = int(wsum_s)
    else:
        last_ts = last_vu = None
        wsum, dur, n = 0, 0, 0
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["t_us", "vu"], kind="mergesort")
    for t_us, vu in zip(pdf["t_us"], pdf["vu"]):
        t_us, vu = int(t_us), int(vu)
        if last_ts is not None:
            seg = t_us - last_ts
            wsum += last_vu * seg
            dur += seg
        last_ts, last_vu = t_us, vu
        n += 1
    state.update((last_ts, last_vu, str(wsum), dur, n))
    # HALF_UP to match Spark's double ROUND (python round() is banker's)
    if dur > 0:
        x = float(wsum) / dur
        twap = int(math.floor(x + 0.5)) if x >= 0 else -int(
            math.floor(-x + 0.5)
        )
    else:
        twap = None
    yield pd.DataFrame(
        {
            "key": [int(key[0])],
            "n_events": [n],
            "dur_us": [dur],
            "twap_micro": [twap],
        }
    )


def twap_stream(samples: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming running TWAP per key (append mode: one row per key per
    extending micro-batch; the LAST row per key equals the batch
    operator over the replayed prefix). Input needs (key, ts, value)."""
    prepped = samples.withWatermark("ts", watermark).select(
        F.col("key").cast("long").alias("key"),
        F.unix_micros(F.col("ts")).alias("t_us"),
        F.round(F.col("value") * 1_000_000, 0).cast("long").alias("vu"),
    )
    return prepped.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
