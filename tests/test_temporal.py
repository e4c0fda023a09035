"""Hand-computed fixtures for the temporal operators: as-of join,
binned range join, multi-resolution time rollup."""

import datetime as dt

from pyspark.sql import functions as F

from surfactant_spark.operators.temporal import (
    asof_join,
    range_bin_join,
    time_rollup,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 00:00:05")),  # after r at :03 -> 100
            (2, 10, _ts("2024-01-01 00:00:03")),  # EQUAL ts -> inclusive match
            (3, 10, _ts("2024-01-01 00:00:01")),  # before any right row -> NULL
            (4, 20, _ts("2024-01-01 00:00:09")),  # other group -> 300
        ],
        ["id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 00:00:03"), 100),
            (10, _ts("2024-01-01 00:00:04"), 200),
            (20, _ts("2024-01-01 00:00:02"), 300),
        ],
        ["user_id", "ts", "val"],
    )
    out = {
        r.id: r.asof_val
        for r in asof_join(left, right, on="user_id", ts="ts", payload=["val"]).collect()
    }
    assert out == {1: 200, 2: 100, 3: None, 4: 300}


def test_asof_join_picks_latest_not_first(spark):
    left = spark.createDataFrame([(1, 5, _ts("2024-01-01 01:00:00"))],
                                 ["id", "k", "ts"])
    right = spark.createDataFrame(
        [(5, _ts("2024-01-01 00:00:01"), "old"), (5, _ts("2024-01-01 00:59:59"), "new")],
        ["k", "ts", "tag"],
    )
    [row] = asof_join(left, right, on="k", ts="ts", payload=["tag"]).collect()
    assert row.asof_tag == "new" and row.asof_ts == _ts("2024-01-01 00:59:59")


def test_range_bin_join_boundaries_and_multi_bin(spark):
    # interval [95, 210] spans bins 9,10,...,21 at width 10
    iv = spark.createDataFrame([("A", 95, 210), ("B", 0, 4)], ["name", "lo", "hi"])
    pts = spark.createDataFrame(
        [(1, 95), (2, 210), (3, 94), (4, 211), (5, 150), (6, 4), (7, 5)],
        ["pid", "v"],
    )
    got = {
        (r.name, r.pid)
        for r in range_bin_join(pts, iv, value="v", lo="lo", hi="hi", bin_width=10).collect()
    }
    # inclusive on both endpoints, exclusive just outside
    assert got == {("A", 1), ("A", 2), ("A", 5), ("B", 6)}


def test_time_rollup_day_is_sum_of_hours(spark):
    ev = spark.createDataFrame(
        [
            (_ts("2024-01-01 00:10:00"), "x", 1),
            (_ts("2024-01-01 00:50:00"), "x", 2),
            (_ts("2024-01-01 13:00:00"), "x", 4),
            (_ts("2024-01-02 00:00:00"), "x", 8),
            (_ts("2024-01-01 05:00:00"), "y", 16),
        ],
        ["ts", "typ", "v"],
    )
    out = time_rollup(
        ev, ts="ts", keys=["typ"],
        aggs={"n": F.count(F.lit(1)).cast("long"),
              "s": F.sum("v").cast("long")},
    )
    rows = {(r.level, r.bucket, r.typ): (r.n, r.s) for r in out.collect()}
    assert rows[("hour", "2024-01-01 00:00:00", "x")] == (2, 3)
    assert rows[("hour", "2024-01-01 13:00:00", "x")] == (1, 4)
    assert rows[("day", "2024-01-01 00:00:00", "x")] == (3, 7)
    assert rows[("day", "2024-01-02 00:00:00", "x")] == (1, 8)
    assert rows[("day", "2024-01-01 00:00:00", "y")] == (1, 16)
    # 4 hour rows (the two 00:xx x-events share a bucket) + 3 day rows
    assert len(rows) == 7


def test_latest_capture_collapses_and_picks_newest(spark):
    import datetime

    from surfactant_spark.operators.temporal import latest_capture

    d = datetime.date
    caps = spark.createDataFrame(
        [
            ("HTTP://A.com:80/x", d(2026, 1, 1), 1),
            ("http://a.com/x", d(2026, 2, 1), 2),    # newest of canon /x
            ("http://a.com/x", d(2026, 2, 1), 3),    # same ts -> tie by ukey
            ("http://b.com/y", d(2026, 1, 15), 4),
        ],
        ["url", "warc_ts", "ukey"],
    )
    got = {
        r.canon: (r.ukey, r.n_captures, r.warc_ts)
        for r in latest_capture(caps, "url", "warc_ts", "ukey").collect()
    }
    assert got == {
        "http://a.com/x": (2, 3, d(2026, 2, 1)),
        "http://b.com/y": (4, 1, d(2026, 1, 15)),
    }


def test_capture_drift_zero_for_identical_captures(spark):
    from surfactant_spark.operators.temporal import capture_drift

    caps = spark.createDataFrame(
        [(10, 1, 0, "same text here"), (11, 1, 1, "same text here"),
         (12, 1, 2, "same text here but changed a lot of words now")],
        ["capture_id", "url", "capture_ts", "text"],
    )
    got = {r.capture_id: r.drift_bits for r in capture_drift(caps).collect()}
    assert set(got) == {11, 12}   # first capture has no predecessor
    assert got[11] == 0           # identical content -> zero drift
    assert got[12] > 0


def test_capture_drift_partitions_per_url(spark):
    from surfactant_spark.operators.temporal import capture_drift

    caps = spark.createDataFrame(
        [(1, "a", 0, "alpha body text"), (2, "b", 0, "beta body text"),
         (3, "a", 1, "alpha body text plus more")],
        ["capture_id", "url", "capture_ts", "text"],
    )
    rows = capture_drift(caps).collect()
    # url b has a single capture: no drift row; url a has one
    assert [r.capture_id for r in rows] == [3]


def test_asof_join_null_right_ts_dropped(spark):
    """A right row with NULL ts sorts before everything (ASC NULLS
    FIRST) and must NOT be carried as the most-recent-prior payload —
    it is filtered before the union (ADVICE r5)."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 00:00:05"))], ["id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [(10, None, 999), (10, _ts("2024-01-01 00:00:09"), 100)],
        "user_id int, ts timestamp, val int",
    )
    rows = asof_join(left, right, on="user_id", ts="ts", payload=["val"]).collect()
    assert len(rows) == 1
    # the only valid right row is AFTER the left row -> no match, not 999
    assert rows[0].asof_val is None
