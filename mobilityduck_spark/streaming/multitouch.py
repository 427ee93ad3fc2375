"""Streaming multi-touch attribution: the stateful-streaming twin of
events.multi_touch_attribution (first-touch + linear models).

Per user, the state is the buffer of non-conversion touches still
inside the attribution horizon of the NEWEST event seen — with
per-key time-ordered replay (the Kafka-per-key-ordering deployment
assumption), any touch older than `now - horizon` can never be
in-horizon for a later conversion, so it is evicted on every event.

Late-but-within-watermark DISORDER (pinned by the two
test_multi_touch_stream_late_* units, VERDICT r10 item 7): rows are
re-sorted by event time inside each micro-batch, and a touch arriving
a batch late is buffered like any other (the eviction filter uses the
ROW's own event time, so an admitted late touch is never evicted by a
newer sibling) and credited by every LATER-ARRIVING conversion; a
conversion already emitted is never retro-credited — per-conversion
credit finalizes at the conversion's arrival, the append-mode
contract. Scoring itself re-checks the horizon per conversion, so a
stale-but-buffered late touch can never leak credit.
State is therefore bounded by touches-per-horizon-window per user —
exactly the candidate volume the batch operator's horizon-banded join
reads, made resident — and the per-user state ROW itself expires via
event-time timeout once the watermark passes last-event + horizon, so
idle/churned users do not hold a state-store row forever (the buffer
they held was provably stale for any admissible future conversion).

Each conversion is scored AT ARRIVAL against the buffer: one emitted
row per (model, credited touch) plus the 'direct' rows for touchless
conversions, with the batch operator's per-touch HALF_UP rounding
(decimal.Decimal, matching Spark's BigDecimal ROUND_HALF_UP — python's
built-in round() is banker's and would drift). Summing the emitted
(cc, rc) by (model, channel) reproduces the batch table exactly; the
parity test proves it over a multi-batch replay.
"""

from __future__ import annotations

from collections.abc import Iterable
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.events import _interval_us

OUTPUT_SCHEMA = (
    "user_id long, conv_id long, model string, channel string, "
    "cc long, rc long"
)
STATE_SCHEMA = "tts array<long>, chs array<string>, tids array<long>"


def _half_up(x: float) -> int:
    """Round half away from zero on the double's SHORTEST decimal
    representation — bit-for-bit the semantics of Spark's F.round
    (Round(double) goes through BigDecimal.valueOf, i.e.
    Double.toString's shortest round-tripping repr, which Python's
    repr(float) also produces). Decimal(repr(x)) rather than
    Decimal(x): the exact-binary-expansion form can diverge from
    Spark at .5 boundaries for magnitudes >= 2^52 (ADVICE r10)."""
    return int(
        Decimal(repr(x)).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def _make_update(conversion_type: str, horizon_us: int):
    def _update(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            # the watermark passed this user's last touch + horizon:
            # every buffered touch is stale for ANY future conversion
            # (late rows older than the watermark never reach us), so
            # dropping the state row changes no answer — it only stops
            # idle users from holding a state-store row forever
            state.remove()
            return
        if state.exists:
            tts, chs, tids = (list(a) for a in state.get)
        else:
            tts, chs, tids = [], [], []
        buf = list(zip((int(t) for t in tts), chs, (int(i) for i in tids)))
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["t_us", "event_id"], kind="mergesort")
        out: list[tuple[int, int, str, str, int, int]] = []
        uid = int(key[0])
        for t_us, event_id, ty, v_micro in zip(
            pdf["t_us"], pdf["event_id"], pdf["event_type"], pdf["v_micro"]
        ):
            t_us, event_id = int(t_us), int(event_id)
            if ty == conversion_type:
                hits = [
                    (tt, ch, tid)
                    for tt, ch, tid in buf
                    if tt < t_us and tt >= t_us - horizon_us
                ]
                # NULL value arrives as NaN through Arrow; the batch
                # twin's SUM skips NULL contributions, which a zero
                # credit reproduces (and int(NaN) would kill the query)
                rev = 0 if pd.isna(v_micro) else int(v_micro)
                if hits:
                    n = len(hits)
                    cc = _half_up(1e6 / n)
                    rc = _half_up(rev / n)
                    for _, ch, _tid in hits:
                        out.append((uid, event_id, "linear", ch, cc, rc))
                    # earliest touch, touch_id tiebreak — same order as
                    # the batch row_number(tt asc, touch_id asc)
                    first_ch = min(hits, key=lambda e: (e[0], e[2]))[1]
                    out.append(
                        (uid, event_id, "first", first_ch, 1_000_000, rev)
                    )
                else:
                    for model in ("linear", "first"):
                        out.append(
                            (uid, event_id, model, "direct", 1_000_000, rev)
                        )
            else:
                buf.append((t_us, str(ty), event_id))
            # time-ordered replay: nothing older than now - horizon can
            # serve a future conversion — evict, keeping state bounded
            buf = [e for e in buf if e[0] >= t_us - horizon_us]
        state.update(
            (
                [e[0] for e in buf],
                [e[1] for e in buf],
                [e[2] for e in buf],
            )
        )
        # expire this user's state once the watermark proves no future
        # conversion can use anything we hold: last event + horizon.
        # Clamp above the current watermark — Spark rejects timeout
        # timestamps at or below it (reachable when this batch's rows
        # are late-but-admitted)
        last_ms = (max(e[0] for e in buf) // 1000 if buf
                   else int(pdf["t_us"].max()) // 1000)
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max(last_ms + horizon_us // 1000, wm_ms + 1)
        )
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id", "conv_id", "model", "channel", "cc", "rc",
                ],
            )

    return _update


def multi_touch_stream(
    events: DataFrame,
    conversion_type: str = "purchase",
    horizon: str = "7 days",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming per-conversion multi-touch credit rows (append mode):
    for every conversion, one row per (model='linear', in-horizon
    touch) with the per-touch rounded credit share, one 'first' row
    for the earliest touch, and 'direct' rows when no touch is in the
    horizon. Input needs (user_id, ts, event_id, event_type, value).
    SUM(cc), SUM(rc) grouped by (model, channel) equals the batch
    multi_touch_attribution table."""
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
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
