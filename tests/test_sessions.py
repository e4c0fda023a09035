"""Stateful streaming sessionization vs the batch lag/cumsum oracle."""

import time

from pyspark.sql import functions as F

from surfactant_spark.streaming.sessions import sessionize_batch, sessionize_stream


def test_stream_sessions_match_batch(spark, tmp_path):
    # small deterministic slice of the driver events table, delivered
    # as time-ordered file drops (the crawl/WARC-drop shape) — the
    # stateful operator assumes bounded disorder via the watermark, so
    # the fixture must not scramble event time across micro-batches
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .where(F.col("user_id") < 6)
        .select("user_id", "ts")
    )
    src = str(tmp_path / "events")
    # quartile files written sequentially → increasing modTimes →
    # the file source triggers them in time order
    qs = events.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp)), array(0.25,0.5,0.75)) p"
    ).collect()[0]["p"]
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    slices = [
        events.where(micros <= qs[0]),
        events.where((micros > qs[0]) & (micros <= qs[1])),
        events.where((micros > qs[1]) & (micros <= qs[2])),
        events.where(micros > qs[2]),
    ]
    for sl in slices:
        sl.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct file modTimes → deterministic order

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap="30 minutes", watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("t_sessions")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.monotonic() + 180
        while time.monotonic() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("select * from t_sessions").collect()
    }
    exp_all = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(
            spark.read.parquet(src), gap="30 minutes"
        ).collect()
    }
    # streaming emits only CLOSED sessions (watermark never passes the
    # final session of each user in a finite stream) → got must be a
    # large, exact subset of the batch result
    assert got <= exp_all, f"streaming emitted sessions not in batch: {list(got - exp_all)[:3]}"
    assert len(got) >= 0.5 * len(exp_all) and len(exp_all) > 10
    # per-user: every batch session except possibly the last is emitted
    open_per_user = {}
    for u, s, e, n in exp_all - got:
        open_per_user.setdefault(u, 0)
        open_per_user[u] += 1
    assert all(v == 1 for v in open_per_user.values()), open_per_user


def test_stream_sessions_cross_batch_disorder(spark, tmp_path):
    """Out-of-order events the watermark explicitly admits: a late event
    older than the open session's start must extend it backward, and a
    late event more than `gap` before the session must form its OWN
    earlier session — exactly as the batch oracle sessionizes them."""
    import datetime

    def t(h, m=0):
        return datetime.datetime(2024, 1, 1, h, m)

    batches = [
        [(1, t(10, 0)), (1, t(10, 10))],
        # admitted late (watermark 2h behind 10:10 = 8:10): 8:30 is its
        # own earlier session; 9:50 extends the 10:00 session backward
        [(1, t(8, 30)), (1, t(9, 50))],
        [(1, t(20, 0))],   # pushes the watermark source data forward
        [(2, t(21, 0))],   # one more batch so user 1's timeout fires
    ]
    src = str(tmp_path / "events")
    for rows in batches:
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap="30 minutes", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("t_sessions_disorder")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("select * from t_sessions_disorder").collect()
    }
    # closed sessions: the lone 8:30 event AND the backward-extended
    # 9:50-10:10 session (n=3); 20:00 / 21:00 stay open (watermark
    # never passes them in a finite stream)
    assert (1, t(8, 30), t(8, 30), 1) in got, got
    assert (1, t(9, 50), t(10, 10), 3) in got, got
    exp_all = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(
            spark.read.parquet(src), gap="30 minutes"
        ).collect()
    }
    assert got <= exp_all, list(got - exp_all)


def test_batch_sessionizer_gap_semantics(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0), (1, t0 + datetime.timedelta(minutes=10)),      # session A (2)
        (1, t0 + datetime.timedelta(minutes=50)),                # session B (1)
        (2, t0),                                                 # session C (1)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(r.user_id, r.n_events) for r in sessionize_batch(df, gap="30 minutes").collect()}
    assert got == {(1, 2), (1, 1), (2, 1)}
