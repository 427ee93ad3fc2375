"""Streaming SCD2 maintenance: the stateful-streaming twin of
governance.scd2_compact.

Per business key, the state is the OPEN interval (attr, valid_from_us);
each arriving change CLOSES the open interval (emitted as an append row
with its valid_to_us) and opens a new one. Consecutive equal attribute
values collapse exactly as in the batch operator. With per-key
time-ordered replay the emitted rows equal the batch operator's CLOSED
intervals (valid_to_us != -1); the still-open interval per key lives in
state, exactly as a warehouse's current-row partition does.

Scale shape: one (attr, from_us) tuple of state per live key; each
micro-batch sorts only its own rows per key.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "key long, attr string, valid_from_us long, valid_to_us long"
)
STATE_SCHEMA = "attr string, from_us long"


def _update(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    # "no open interval" (state.exists False) is tracked separately
    # from the open interval's VALUE: a NULL attribute is a legal SCD2
    # value (non-NULL -> NULL opens a NULL interval; NULL runs
    # collapse), matching the batch operator's null-safe comparison.
    has_open = state.exists
    attr, from_us = state.get if has_open else (None, None)
    pdf = pd.concat(list(pdfs), ignore_index=True)
    pdf = pdf.sort_values(["t_us", "tb"], kind="mergesort")
    out_attr, out_from, out_to = [], [], []
    for t_us, a in zip(pdf["t_us"], pdf["attr"]):
        a = None if pd.isna(a) else str(a)
        if not has_open:
            attr, from_us, has_open = a, int(t_us), True
        elif a != attr:  # Python != is null-safe: None != None is False
            out_attr.append(attr)
            out_from.append(int(from_us))
            out_to.append(int(t_us))
            attr, from_us = a, int(t_us)
        # equal attr: SCD2 compaction — the open interval absorbs it
    state.update((attr, int(from_us)))
    if out_attr:
        yield pd.DataFrame(
            {
                "key": [int(key[0])] * len(out_attr),
                "attr": out_attr,
                "valid_from_us": out_from,
                "valid_to_us": out_to,
            }
        )


def scd2_stream(
    log: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming SCD2 compaction (append mode): emits each CLOSED
    validity interval the moment the change that closes it arrives.
    Input needs (key, ts, attr, tiebreak) columns."""
    prepped = log.withWatermark(ts_col, watermark).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.unix_micros(F.col(ts_col)).alias("t_us"),
        F.col(attr_col).alias("attr"),
        F.col(tiebreak_col).alias("tb"),
    )
    return prepped.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
