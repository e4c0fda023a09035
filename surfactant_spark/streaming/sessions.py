"""Custom stateful streaming operator: gap-based sessionization.

The reference has no streaming (SURVEY §2.8); this is the
`applyInPandasWithState` exemplar the target architecture calls for —
arbitrary per-key state kept across micro-batches with event-time
timeouts.  Semantics: events for a key belong to one session while
consecutive gaps are < ``gap``; a session closes once the watermark
passes its last event + gap (no admitted event can reach it anymore),
emitting one row.

Out-of-order correctness: the watermark *admits* late events, so a
micro-batch may deliver events older than the open session's start, or
events that split/merge what an earlier batch saw.  State therefore
buffers the raw event timestamps of the not-yet-closed region and
re-sessionizes the merged buffer on every invocation; only sessions
whose ``end + gap <= watermark`` are emitted (final by construction —
any event that could still attach to them would be older than the
watermark and dropped upstream).  State size is bounded by the events
inside one watermark horizon per key.

Batch oracle: the classic lag/cumsum sessionization
(``sessionize_batch``) — tests assert the streaming run emits exactly
the batch result once all data is processed, including cross-batch
disorder within the watermark.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("ts_us", T.ArrayType(T.LongType()))]
)


def _gap_us(gap: str) -> int:
    """Gap in microseconds, shared by the streaming operator and the
    batch oracle so sub-second gaps ('500 milliseconds') classify
    identically in both paths (no truncation to whole seconds)."""
    return int(pd.Timedelta(gap).total_seconds() * 1_000_000)


def _sessionize_ts(ts_sorted: list[int], gap_us: int) -> list[tuple[int, int, int]]:
    """Sorted event epochs → [(start_us, end_us, n)] with gap >= gap_us
    starting a new session — the single sessionization rule both the
    stream operator and the batch oracle implement."""
    sessions: list[tuple[int, int, int]] = []
    start = end = ts_sorted[0]
    n = 1
    for t in ts_sorted[1:]:
        if t - end >= gap_us:
            sessions.append((start, end, n))
            start, n = t, 0
        end = t
        n += 1
    sessions.append((start, end, n))
    return sessions


def _session_fn(gap_us: int):
    gap_ms = gap_us // 1000

    def fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        ts_us: list[int] = []
        if state.exists:
            ts_us.extend(state.get[0])
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                ts_us.extend(int(t.value // 1_000) for t in pdf["ts"])
        if not ts_us:
            if state.exists:
                state.remove()
            return
        ts_us.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        sessions = _sessionize_ts(ts_us, gap_us)
        closed = [s for s in sessions if s[1] + gap_us <= wm_us]
        kept = sessions[len(closed):]
        if kept:
            # buffer only the not-yet-final region; closed sessions can
            # never be reached by an admitted event again
            keep_from = kept[0][0]
            state.update(([t for t in ts_us if t >= keep_from],))
            # next closable instant (clamp: timeouts may not be set at
            # or before the current watermark)
            state.setTimeoutTimestamp(
                max(kept[0][1] // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()
        if closed:
            yield pd.DataFrame(
                [
                    (key[0], pd.Timestamp(s, unit="us"), pd.Timestamp(e, unit="us"), n)
                    for s, e, n in closed
                ],
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return fn


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming events(user_id, ts, …) → closed sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(_gap_us(gap)),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch oracle: lag-gap → cumulative session index → group."""
    from pyspark.sql.window import Window

    gap_us = _gap_us(gap)
    w = Window.partitionBy("user_id").orderBy("ts")
    # microsecond epochs so gap boundaries classify identically to the
    # streaming operator (NTZ can't cast straight to long in Spark 4)
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    marked = events.select("user_id", "ts").withColumn(
        "new_sess",
        F.when(
            epoch - F.lag(epoch).over(w) >= gap_us, 1
        ).otherwise(0),
    )
    sess = marked.withColumn("sess_id", F.sum("new_sess").over(w))
    return sess.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).drop("sess_id")
