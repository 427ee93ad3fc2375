"""Streaming K-minimum-values distinct sketch: the stream twin of
operators/events.kmv_distinct with state bounded at k hash values per
group, forever.

KMV is a TRUE mergeable sketch: the k smallest hashes of a union are
a function of the union only, so the streaming fold (merge each
micro-batch's hashes into the k-min list) lands on EXACTLY the batch
answer regardless of how the stream is micro-batched or reordered —
the stream≡batch parity the tests pin. That determinism is why this
twin can share the batch operator's oracle-checked estimate formula
verbatim: est = (k-1) * 2^48 / kth_min over the portable 48-bit md5
prefix hash (computed JVM-side before the stateful operator, so the
python fold only ever merges longs).

State per key: one array of at most k BIGINTs. A billion distinct
users cost the same 32 longs per event type as a hundred.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "etype string, ver long, n_mins int, kth_hash long, est long"
)
STATE_SCHEMA = "ver long, mins array<long>"


def _make_update(k: int):
    def update(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            ver, mins = state.get
            mins = list(mins)
        else:
            ver, mins = 0, []
        s = set(mins)
        for pdf in pdfs:
            s.update(int(h) for h in pdf["h"])
        mins = sorted(s)[:k]
        ver += 1
        state.update((ver, mins))
        if len(mins) >= k:
            kth = mins[k - 1]
            est = int(round((k - 1) * 281474976710656.0 / kth))
        else:
            kth, est = 0, len(mins)
        yield pd.DataFrame(
            {
                "etype": [key[0]],
                "ver": [ver],
                "n_mins": [len(mins)],
                "kth_hash": [kth],
                "est": [est],
            }
        )

    return update


def streaming_kmv_distinct(
    events: DataFrame,
    k: int = 32,
    type_col: str = "event_type",
    user_col: str = "user_id",
    salt: str = "kmv1",
) -> DataFrame:
    """Per-type distinct-user estimate over a stream with k-bounded
    state. Emits the sketch per micro-batch in update mode, stamped
    with a monotone `ver` (take MAX(ver) per etype for the current
    answer). Hashing matches the batch operator exactly (md5 48-bit
    prefix of user_id || salt), so the final emission equals
    operators/events.kmv_distinct's (kth_hash, est) on the same data
    — proven by the parity test, not assumed."""
    hashed = events.select(
        F.col(type_col).cast("string").alias("etype"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col(user_col).cast("string"), F.lit(salt))
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    return hashed.groupBy("etype").applyInPandasWithState(
        _make_update(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
