"""Streaming heavy hitters with BOUNDED state: batched Space-Saving
(Metwally et al. 2005) inside applyInPandasWithState.

The streaming groupBy-count answer to "what are the top items right
now" keeps one state row PER DISTINCT ITEM — unbounded when the item
domain explodes (URLs, n-grams, user agents). Space-Saving caps the
summary at k counters per hash bucket: an unseen item evicts the
current minimum counter and inherits its count as its error bound, so
state is EXACTLY n_buckets × k rows forever, with the classic
guarantees per bucket:

- count_est(item) ∈ [true_count, true_count + err(item)];
- every item whose true count exceeds bucket_stream_length / k is
  present in the summary (no false negatives above the threshold);
- when a bucket sees ≤ k distinct items, its summary is EXACT
  (err = 0 and count_est = true_count).

Items are routed to buckets by hash, so each item lives in exactly one
bucket and the per-bucket guarantees hold independently — the same
sharding that makes the batch Misra-Gries sketch (operators/text.py
heavy_ngrams_exact) mergeable. Occurrences are batch-combined per
micro-batch before the counter update (an eviction charges the evicted
minimum once per NEW item, not once per occurrence), which preserves
the overestimate-only property.

This is the streaming twin of the batch heavy-hitters path; the unit
tests prove the exact regime equals a batch groupBy-count and the
eviction regime respects both guarantee directions.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "bucket int, ver long, item string, cnt long, err long"
STATE_SCHEMA = (
    "ver long, items array<string>, counts array<long>, errs array<long>"
)


def _make_update(k: int):
    def update(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            ver, items, counts, errs = state.get
            d = {
                it: (int(c), int(e))
                for it, c, e in zip(items, counts, errs)
            }
        else:
            ver, d = 0, {}
        for pdf in pdfs:
            # combine occurrences first; iterate in sorted item order so
            # eviction tie-breaks are deterministic across replays
            vc = pdf["item"].value_counts()
            for it in sorted(vc.index):
                c = int(vc[it])
                if it in d:
                    cnt, err = d[it]
                    d[it] = (cnt + c, err)
                elif len(d) < k:
                    d[it] = (c, 0)
                else:
                    # evict the minimum counter (count, then item, so
                    # ties are deterministic); the newcomer inherits the
                    # minimum as its overestimate bound
                    m_it = min(d, key=lambda x: (d[x][0], x))
                    m_c = d[m_it][0]
                    del d[m_it]
                    d[it] = (m_c + c, m_c)
        ver += 1
        its = sorted(d)
        state.update(
            (
                ver,
                its,
                [d[i][0] for i in its],
                [d[i][1] for i in its],
            )
        )
        yield pd.DataFrame(
            {
                "bucket": [int(key[0])] * len(its),
                "ver": [ver] * len(its),
                "item": its,
                "cnt": [d[i][0] for i in its],
                "err": [d[i][1] for i in its],
            }
        )

    return update


def streaming_heavy_hitters(
    items: DataFrame,
    item_col: str = "item",
    k_per_bucket: int = 64,
    n_buckets: int = 16,
) -> DataFrame:
    """Space-Saving top items over a stream: state bounded at
    n_buckets × k_per_bucket counters regardless of item cardinality
    or stream length. Emits each bucket's full summary per micro-batch
    in update mode, stamped with a monotone `ver` so a consumer takes
    MAX(ver) per bucket for the current answer. Route key is a hash of
    the item, so per-bucket guarantees are independent and summaries
    union without double counting."""
    routed = items.select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
        F.col(item_col).cast("string").alias("item"),
    )
    return routed.groupBy("bucket").applyInPandasWithState(
        _make_update(k_per_bucket),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
