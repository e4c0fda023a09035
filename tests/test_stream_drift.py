"""Streaming capture drift (streaming/drift.py) vs the batch operator
(temporal.capture_drift) and the Spark simhash aggregate."""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from surfactant_spark.operators.dedup import simhash64
from surfactant_spark.operators.temporal import capture_drift
from surfactant_spark.streaming.drift import capture_drift_stream, py_simhash64


def test_py_simhash_matches_spark_aggregate(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    got = {
        r.doc_id: (r.sh_hi, r.sh_lo) for r in simhash64(docs).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        assert py_simhash64(r.text) == got[r.doc_id], r.doc_id
    assert py_simhash64("") is None
    assert py_simhash64("???") is None


def _captures(spark, n_docs=30):
    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where(F.col("doc_id") < n_docs)
    )
    k = F.col("k")
    return d.select(
        "doc_id", "text",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("k"),
    ).select(
        (F.col("doc_id") * 10 + k).alias("capture_id"),
        F.col("doc_id").cast("string").alias("url"),
        F.timestamp_seconds(F.lit(1_700_000_000) + k * 3600).alias("capture_ts"),
        F.concat(
            F.col("text"),
            F.when(k >= 1, F.lit(" verandamarker")).otherwise(F.lit("")),
            F.when(k >= 2, F.lit(" zephyrtoken")).otherwise(F.lit("")),
        ).alias("text"),
    )


def test_stream_drift_matches_batch(spark, tmp_path):
    caps = _captures(spark)
    src = str(tmp_path / "caps")
    # deliver capture generations as ordered file drops, plus a far-
    # future sentinel url that pushes the watermark past every real
    # capture so all drift rows finalize
    for kval in (0, 1, 2):
        caps.where(F.col("capture_id") % 10 == kval).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    sentinel = spark.createDataFrame(
        [(999_999, "zz-sentinel", "sentinel words here")],
        "capture_id long, url string, text string",
    ).select(
        "capture_id", "url",
        F.timestamp_seconds(F.lit(1_800_000_000)).alias("capture_ts"),
        "text",
    ).select("capture_id", "url", "capture_ts", "text")
    time.sleep(1.1)
    sentinel.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "capture_id long, url string, capture_ts timestamp, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        capture_drift_stream(stream, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("t_drift")
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
        (r.url, r.capture_id, r.drift_bits)
        for r in spark.sql("SELECT * FROM t_drift").collect()
    }
    exp = {
        (r.url, r.capture_id, r.drift_bits)
        for r in capture_drift(
            caps, order_col="capture_ts", id_col="capture_id"
        ).collect()
    }
    assert got == exp and len(exp) > 0


def test_stream_drift_late_capture_rechains(spark, tmp_path):
    """A late middle capture admitted by the watermark must become the
    predecessor of the capture that previously chained to the first."""

    def cap(cid, ts_h, text):
        return (cid, "u1", ts_h, text)

    rows1 = [cap(1, 8, "alpha beta gamma"), cap(3, 10, "alpha beta delta")]
    rows2 = [cap(2, 9, "alpha beta epsilon")]  # late but admitted (wm 4h)
    rows3 = [cap(9, 23, "push watermark forward")]

    src = str(tmp_path / "caps")
    for rows in (rows1, rows2, rows3):
        df = spark.createDataFrame(
            rows, "capture_id long, url string, h long, text string"
        ).select(
            "capture_id", "url",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("h") * 3600).alias(
                "capture_ts"
            ),
            "text",
        )
        df.coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(
            "capture_id long, url string, capture_ts timestamp, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        capture_drift_stream(stream, watermark="4 hours")
        .writeStream.format("memory")
        .queryName("t_drift_late")
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
        (r.capture_id, r.drift_bits)
        for r in spark.sql(
            "SELECT * FROM t_drift_late WHERE url = 'u1'"
        ).collect()
    }
    # batch truth over the full (re-ordered) chain 1 → 2 → 3
    all_rows = spark.createDataFrame(
        rows1 + rows2, "capture_id long, url string, h long, text string"
    ).select(
        "capture_id", "url",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("h") * 3600).alias(
            "capture_ts"
        ),
        "text",
    )
    exp = {
        (r.capture_id, r.drift_bits)
        for r in capture_drift(
            all_rows, order_col="capture_ts", id_col="capture_id"
        ).collect()
    }
    assert got == exp
    assert {c for c, _ in got} == {2, 3}  # both chained rows emitted


def test_stream_drift_tokenless_batch_keeps_head(spark, tmp_path):
    """A micro-batch whose captures are all token-less must NOT erase
    the url's finalized chain head: the next real capture still
    chains to the last emitted one, exactly as batch capture_drift
    does (r7 fix — the old code removed the state whenever the
    buffered region was empty, silently dropping the next drift row)."""

    def cap(cid, ts_h, text, url="u1"):
        return (cid, url, ts_h, text)

    drops = [
        # c0 arrives; sentinel pushes max event time to h=4
        [cap(1, 0, "alpha beta gamma"), cap(901, 4, "wm push one", "zz")],
        # c0 finalizes via timeout during this batch; then a purely
        # token-less capture for u1 lands (the buggy path: buf empty,
        # head set) and the watermark moves past it
        [cap(2, 6, "???"), cap(902, 8, "wm push two", "zz")],
        # the next REAL capture must still chain to c0
        [cap(3, 10, "alpha beta gamma delta"), cap(903, 14, "wm push three", "zz")],
        # final watermark push so c3 finalizes
        [cap(904, 23, "wm push four", "zz")],
    ]
    src = str(tmp_path / "caps")
    for rows in drops:
        spark.createDataFrame(
            rows, "capture_id long, url string, h long, text string"
        ).select(
            "capture_id", "url",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("h") * 3600).alias(
                "capture_ts"
            ),
            "text",
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(
            "capture_id long, url string, capture_ts timestamp, text string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        capture_drift_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_drift_headkeep")
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
        (r.capture_id, r.drift_bits)
        for r in spark.sql(
            "SELECT * FROM t_drift_headkeep WHERE url = 'u1'"
        ).collect()
    }
    h0 = py_simhash64("alpha beta gamma")
    h3 = py_simhash64("alpha beta gamma delta")
    expected_bits = bin(h0[0] ^ h3[0]).count("1") + bin(h0[1] ^ h3[1]).count("1")
    # exactly one drift row: capture 3 chained to capture 1 (the
    # token-less capture 2 is not part of the chain, matching batch)
    assert got == {(3, expected_bits)}, got
