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
    # a key's micro-batch may span multiple Arrow chunks, and chunks are
    # not globally ts-ordered — track the (ts, value) of the max-ts row
    # ACROSS chunks so last_value is the key's global latest, not the
    # final chunk's latest
    last_ts = None
    for pdf in pdfs:
        idx = pdf["ts"].idxmax()
        vals = pdf["value"]
        n += len(pdf)
        mn = vals.min() if mn is None else min(mn, vals.min())
        mx = vals.max() if mx is None else max(mx, vals.max())
        chunk_ts = pdf["ts"].loc[idx]
        if last_ts is None or chunk_ts >= last_ts:
            last_ts = chunk_ts
            last = float(vals.loc[idx])
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


# ---------------------------------------------------------------------
# Spark 4 transformWithState flavor of the same operator: typed state
# variables managed by the engine (RocksDB-backed at deployment scale)
# instead of one opaque GroupState tuple. The semantics are identical
# to running_user_stats, so the unit test proves the two APIs agree
# with the batch aggregate.
# ---------------------------------------------------------------------
try:  # pragma: no cover - import surface varies across Spark minors
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "stats", "n long, mn double, mx double, last double"
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._st.exists():
                n, mn, mx, last = self._st.get()
            else:
                n, mn, mx, last = 0, None, None, None
            # same cross-chunk rule as _update: last_value must come from
            # the key's global max-ts row, not the final chunk's
            last_ts = None
            for pdf in rows:
                idx = pdf["ts"].idxmax()
                vals = pdf["value"]
                n += len(pdf)
                mn = vals.min() if mn is None else min(mn, vals.min())
                mx = vals.max() if mx is None else max(mx, vals.max())
                chunk_ts = pdf["ts"].loc[idx]
                if last_ts is None or chunk_ts >= last_ts:
                    last_ts = chunk_ts
                    last = float(vals.loc[idx])
            self._st.update((int(n), float(mn), float(mx), float(last)))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_instants": [int(n)],
                    "min_value": [float(mn)],
                    "max_value": [float(mx)],
                    "last_value": [float(last)],
                }
            )

        def close(self) -> None:
            pass

    def running_user_stats_tws(events: DataFrame) -> DataFrame:
        """running_user_stats via the Spark 4 transformWithState API:
        engine-managed typed ValueState (RocksDB state store), update
        output mode. Requires the RocksDB state-store provider."""
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_RunningStats(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover
    running_user_stats_tws = None
