"""Streaming last-touch attribution: the stateful-streaming twin of
events.attribution.

Per user, the state is the (ts_us, type) of the latest non-conversion
touch seen so far; each conversion row is attributed at arrival against
that state (horizon-checked in exact microseconds) and emitted as an
append row. With a time-ordered replay (per key across micro-batches —
the Kafka-per-key-ordering deployment assumption) the emitted rows
aggregate to EXACTLY the batch operator's channel table; the parity
test proves it over a 4-batch replay.

Scale shape: applyInPandasWithState keys by user — state is ONE tuple
per live user regardless of event volume, and each micro-batch does a
per-user sort of only that batch's rows.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.events import _interval_us

OUTPUT_SCHEMA = (
    "user_id long, event_id long, channel string, v_micro long"
)
STATE_SCHEMA = "lt_us long, lt_ty string"


def _make_update(conversion_type: str, horizon_us: int):
    def _update(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        lt_us, lt_ty = state.get if state.exists else (None, None)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # batch rows arrive Arrow-chunked and unordered; restore the
        # deterministic (ts, event_id) order the batch operator uses
        pdf = pdf.sort_values(["t_us", "event_id"], kind="mergesort")
        out_user, out_event, out_channel, out_v = [], [], [], []
        for t_us, event_id, ty, v_micro in zip(
            pdf["t_us"], pdf["event_id"], pdf["event_type"], pdf["v_micro"]
        ):
            if ty == conversion_type:
                if lt_us is not None and lt_us >= t_us - horizon_us:
                    ch = lt_ty
                else:
                    ch = "direct"
                out_user.append(int(key[0]))
                out_event.append(int(event_id))
                out_channel.append(ch)
                out_v.append(int(v_micro))
            else:
                lt_us, lt_ty = int(t_us), str(ty)
        if lt_us is not None:
            state.update((int(lt_us), lt_ty))
        if out_user:
            yield pd.DataFrame(
                {
                    "user_id": out_user,
                    "event_id": out_event,
                    "channel": out_channel,
                    "v_micro": out_v,
                }
            )

    return _update


def attribution_stream(
    events: DataFrame,
    conversion_type: str = "purchase",
    horizon: str = "7 days",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming per-conversion attribution rows (append mode): one row
    per conversion event, credited to the user's latest preceding
    non-conversion touch within `horizon` (else 'direct'). Input needs
    (user_id, ts, event_id, event_type, value)."""
    hz = _interval_us(horizon)
    prepped = events.withWatermark("ts", watermark).select(
        "user_id",
        "ts",
        F.unix_micros(F.col("ts")).alias("t_us"),
        "event_id",
        "event_type",
        F.round(F.col("value") * 1e6).cast("long").alias("v_micro"),
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _make_update(conversion_type, hz),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
