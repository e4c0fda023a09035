"""Scan-width guard for compute-heavy projections (guide §2.5 / §6).

Parquet only parallelizes a scan down to the row-group level: a table
written as one row group is ONE map task no matter how many cores the
session has, and every expensive per-row projection an operator stacks
on that scan (regex tokenization, per-shingle md5, vector arithmetic,
pandas UDFs) runs single-threaded until the first exchange.  That is
exactly the "one huge unsplittable input" case of the optimization
playbook: repartition immediately after the read.

``spread`` widens a frame to the session's compute width ONLY when its
current partitioning is narrower — at cluster scale (100 TB inputs,
thousands of splits) the probe sees a wide scan and the call is a
no-op, so no extra shuffle is ever paid where the scan already
parallelizes.  The shuffle it does insert in the narrow case moves the
frame's raw rows once (cheap, pre-explosion/pre-compute by
construction of the call sites) and is HASH partitioning on a caller
named key — deterministic under task retry, unlike round-robin over a
non-deterministic input (SPARK-38388).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compute_width(df: DataFrame) -> int:
    """Target parallelism: the session's scheduler width."""
    return df.sparkSession.sparkContext.defaultParallelism


def pin_groups(df: DataFrame, *key_cols: str, width: int | None = None) -> DataFrame:
    """Explicit hash repartition on the grouping key that AQE will NOT
    coalesce — for frames feeding per-group / per-batch PYTHON stages
    (applyInPandas, mapInPandas-after-distinct) where parallelism
    matters more than shuffle bytes: AQE's size-based coalescing sees
    a tiny-by-bytes shuffle and shrinks it to 1-2 partitions, making
    the Python stage serial.  The following groupBy / dropDuplicates /
    applyInPandas on the same (or a superset) key reuses this
    partitioning, so no extra exchange is introduced; width defaults
    to max(compute width, configured shuffle partitions) so a cluster
    deployment never loses parallelism to the pin."""
    spark = df.sparkSession
    w = width or max(
        compute_width(df),
        int(spark.conf.get("spark.sql.shuffle.partitions")),
    )
    return df.repartition(w, *[F.col(c) for c in key_cols])


def spread(df: DataFrame, *key_cols: str, width: int | None = None) -> DataFrame:
    """Hash-repartition ``df`` on ``key_cols`` up to ``width`` when (and
    only when) its current plan would run narrower than that.

    Call it directly UNDER the heavy projection and AFTER any filters
    that should push to the scan — the exchange blocks pushdown for
    predicates applied above it.
    """
    w = width or compute_width(df)
    try:
        cur = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive: planning failure
        return df
    if cur >= w:
        return df
    if key_cols:
        return df.repartition(w, *[F.col(c) for c in key_cols])
    return df.repartition(w)
