"""Streaming CDC apply: the stateful-streaming twin of
governance.cdc_apply (materialized-view maintenance over a change
stream).

Per business key, the state is the current winning change
(seq, op, payload). Each micro-batch reduces its own rows to the local
max-seq candidate (pandas argmax — never a per-row loop over the whole
history), compares it against state, and EMITS one row whenever the
current row changes — including op='D' tombstone emissions so a
downstream sink can delete. Replaying the full log and keeping each
key's last emission reproduces exactly the batch operator's
last-writer-wins result; out-of-order sequences across micro-batches
are handled because state keeps the max seq ever seen, so a late lower
seq never regresses the view (the same guarantee batch max_by gives).

Scale shape: one fixed-width tuple of state per live key; each
micro-batch ships |batch| rows through one keyed shuffle and touches
state once per distinct key in the batch.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key long, seq long, op string, st string, v long"
STATE_SCHEMA = "seq long, op string, st string, v long"


def _none_if_na(x):
    return None if pd.isna(x) else x


def _update(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    pdf = pd.concat(list(pdfs), ignore_index=True)
    row = pdf.loc[pdf["seq"].idxmax()]
    best = (
        int(row["seq"]),
        str(row["op"]),
        _none_if_na(row["st"]),
        None if pd.isna(row["v"]) else int(row["v"]),
    )
    cur_seq = state.get[0] if state.exists else None
    if cur_seq is None or best[0] > cur_seq:
        state.update(best)
        yield pd.DataFrame(
            {
                "key": [int(key[0])],
                "seq": [best[0]],
                "op": [best[1]],
                "st": [best[2]],
                "v": [best[3]],
            }
        )


def cdc_stream(changes: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming last-writer-wins CDC apply (append mode): emits the
    new current row for a key whenever a higher-sequence change
    arrives. Input needs (key, ts, seq, op, st, v) columns; ts drives
    the watermark only — ordering authority is seq, exactly as in the
    batch operator."""
    prepped = changes.withWatermark("ts", watermark).select(
        F.col("key").cast("long").alias("key"),
        F.col("seq").cast("long").alias("seq"),
        F.col("op").alias("op"),
        F.col("st").alias("st"),
        F.col("v").cast("long").alias("v"),
    )
    return prepped.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
