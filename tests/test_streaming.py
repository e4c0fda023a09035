"""Structured-Streaming pipeline: file-source micro-batches through the
same extraction/mention operators, results equal to the batch run."""

import time

from surfactant_spark.dictionary import compile_dictionary
from surfactant_spark.operators.extract import extract_pages
from surfactant_spark.operators.mentions import detect_mentions, unique_content
from surfactant_spark.sources.pages import synth_pages
from surfactant_spark.streaming.stream_pipeline import (
    run_stream_to_memory,
    windowed_host_counts,
)


def test_stream_mentions_match_batch(spark, tmp_path):
    n = 300
    pages_dir = str(tmp_path / "pages")
    # several files so the file source produces multiple micro-batches
    synth_pages(spark, n, partitions=6).write.parquet(pages_dir)

    q = run_stream_to_memory(
        spark, pages_dir, str(tmp_path / "ckpt"), query_name="t_mstream",
        max_files_per_trigger=2,
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
        (r.content_sha256, r.entity_key)
        for r in spark.sql("select * from t_mstream").collect()
    }
    batch = detect_mentions(
        unique_content(extract_pages(spark.read.parquet(pages_dir))),
        compile_dictionary(),
    )
    exp = {(r.content_sha256, r.entity_key) for r in batch.collect()}
    # streaming detects per micro-batch (no cross-batch content dedup),
    # so the SET of (content, entity) matches even if multiplicity differs
    assert got == exp and len(exp) > 50


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Cross-batch content dedup with bounded state: duplicate content
    hashes delivered in LATER micro-batches (within the watermark) must
    be dropped, so the streamed distinct-content set equals the batch
    distinct over all input."""
    from pyspark.sql import functions as F

    from surfactant_spark.streaming.stream_pipeline import (
        stream_dedup_content,
        stream_extract,
    )
    from surfactant_spark.schema import PAGES_SCHEMA

    n = 120
    pages = synth_pages(spark, n, partitions=1).cache()
    pages_dir = str(tmp_path / "pages")
    # file 1: all pages; files 2-3: re-deliveries of subsets (re-crawl)
    pages.write.mode("append").parquet(pages_dir)
    time.sleep(1.1)
    pages.where(F.col("url").substr(-1, 1).isin("0", "1", "2")).write.mode(
        "append"
    ).parquet(pages_dir)
    time.sleep(1.1)
    pages.limit(30).write.mode("append").parquet(pages_dir)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_dir)
    )
    deduped = stream_dedup_content(stream_extract(stream), watermark="1 hour")
    q = (
        deduped.select("content_sha256", "url")
        .writeStream.format("memory")
        .queryName("t_sdedup")
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
    got = [r.content_sha256 for r in spark.sql("select * from t_sdedup").collect()]
    exp = {r.content_sha256 for r in extract_pages(pages).select("content_sha256").collect()}
    assert len(got) == len(set(got)), "stream emitted a duplicate content hash"
    assert set(got) == exp
    pages.unpersist()


def test_windowed_host_counts_batch_semantics(spark):
    # window aggregation applied to a static frame: verifies the window
    # expression shape (event-time bucketing) without a streaming sink
    ext = extract_pages(synth_pages(spark, 200))
    rows = windowed_host_counts(ext).collect()
    assert sum(r.n_pages for r in rows) == 200
    assert all(r.window_end > r.window_start for r in rows)
