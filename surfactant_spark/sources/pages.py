"""Distributed deterministic pages source.

Replaces the reference's filesystem walk (surfactant/cmd/generate.py:431-454)
with a table scan; here the table is synthesized in-executor from
``spark.range`` so generation itself scales horizontally — each page is
a pure function of its id (testing/corpus.py), so output is identical
for any partitioning.

In production this module is replaced by ``spark.read.table("pages")``
over the Iceberg catalog; everything downstream only sees the
PAGES_SCHEMA DataFrame contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..schema import PAGES_SCHEMA
from ..testing.corpus import make_page


def _gen(n_pages: int, body_scale: int = 1):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pages = [make_page(int(pid), n_pages, body_scale) for pid in pdf["id"]]
            yield pd.DataFrame(
                {
                    "url": [p.url for p in pages],
                    "warc_ts": [p.warc_ts for p in pages],
                    "html": [p.html for p in pages],
                    "text": [p.text for p in pages],
                    "lang": [p.lang for p in pages],
                }
            )

    return fn


def synth_pages(
    spark: SparkSession,
    n_pages: int,
    partitions: int | None = None,
    body_scale: int = 1,
) -> DataFrame:
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_pages, numPartitions=partitions)
    return base.mapInPandas(_gen(n_pages, body_scale), schema=PAGES_SCHEMA)


def write_pages_parquet(spark: SparkSession, n_pages: int, path: str) -> None:
    """Materialize the synthetic corpus as a parquet 'pages' table (the
    Iceberg stand-in used by tests and the bench)."""
    synth_pages(spark, n_pages).write.mode("overwrite").parquet(path)
