"""Custom stateful streaming operator: gap-based sessionization.

The reference has no streaming (SURVEY §2.8); this is the
`applyInPandasWithState` exemplar the target architecture calls for —
arbitrary per-key state kept across micro-batches with event-time
timeouts.  Semantics: events for a key belong to one session while
consecutive gaps are < ``gap``; a session closes when the watermark
passes its last event + gap, emitting one row.

Batch oracle: the classic lag/cumsum sessionization
(``sessionize_batch``) — tests assert the streaming run emits exactly
the batch result once all data is processed.
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
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _session_fn(gap_ms: int):
    def fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(key[0], pd.Timestamp(start_us, unit="us"),
                  pd.Timestamp(end_us, unit="us"), n)],
                columns=["user_id", "session_start", "session_end", "n_events"],
            )
            return
        rows = []
        ts_us: list[int] = []
        for pdf in pdf_iter:
            ts_us.extend(int(t.value // 1_000) for t in pdf["ts"])
        ts_us.sort()
        if state.exists:
            start_us, end_us, n = state.get
        else:
            start_us, end_us, n = ts_us[0], ts_us[0], 0
        for t in ts_us:
            if t - end_us >= gap_ms * 1000 and n > 0:
                rows.append((key[0], pd.Timestamp(start_us, unit="us"),
                             pd.Timestamp(end_us, unit="us"), n))
                start_us, n = t, 0
            end_us = max(end_us, t)
            n += 1
        state.update((start_us, end_us, n))
        # a session whose close time already passed the watermark times
        # out at the next possible instant (clamp: timeouts may not be
        # set before the current watermark)
        state.setTimeoutTimestamp(max(end_us // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1))
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "session_start", "session_end", "n_events"]
            )

    return fn


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming events(user_id, ts, …) → closed sessions."""
    gap_ms = int(pd.Timedelta(gap).total_seconds() * 1000)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_ms),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch oracle: lag-gap → cumulative session index → group."""
    from pyspark.sql.window import Window

    gap_us = int(pd.Timedelta(gap).total_seconds()) * 1_000_000
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
