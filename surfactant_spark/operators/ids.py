"""Global ordered-ID assignment and distributed prefix sums.

Building an embedding vocabulary, a node-ID space for GNN training, or
a negative-sampling table all need "rank every key in global order" —
the zipWithIndex problem.  The naive Spark answer is a row_number
window over an empty PARTITION BY, which funnels the whole table
through ONE task.  These operators use the classic two-phase shape
instead: range-partition by the key (so partition order == key order),
compute per-partition local ranks/sums, and add per-partition offsets
derived from a tiny partition-count frame — every step parallel, the
only driver-sized object is one row per partition.

Mirrors the reference's stable-UUID assignment role (canonical IDs for
software entries, surfactant/sbomtypes/_sbom.py) for the dense-integer
ID spaces ML training needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assign_stable_ids", "prefix_sums"]


def _with_partition_ranks(
    df: DataFrame, key_cols: list[str], partitions: int
) -> DataFrame:
    """Range-partition ``df`` by ``key_cols`` and attach the partition
    id as a materialized column.  localCheckpoint pins the (sampled,
    hence otherwise unstable) range boundaries so every downstream
    branch sees the SAME pid assignment."""
    keyed = df.repartitionByRange(partitions, *[F.col(c) for c in key_cols])
    return keyed.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=False)


def assign_stable_ids(
    df: DataFrame,
    key_cols: list[str],
    partitions: int = 32,
    id_name: str = "uid",
) -> DataFrame:
    """(key…, uid) with uid = 0-based dense global rank of the key
    tuple in ascending order — deterministic for a given key set, no
    matter how the input was partitioned, because range partitions are
    themselves key-ordered: uid = (rows in earlier partitions) +
    (local rank).  Duplicate key tuples are collapsed first; ids are
    contiguous 0..n-1.

    Two shuffles total (the range exchange + the per-pid window's hash
    exchange), both over (key, pid) rows only; the offset join is a
    broadcast of one row per partition."""
    d = df.select(*key_cols).distinct()
    keyed = _with_partition_ranks(d, key_cols, partitions)
    local = keyed.withColumn(
        "_lrank",
        F.row_number().over(
            Window.partitionBy("_pid").orderBy(*[F.col(c) for c in key_cols])
        ),
    )
    counts = keyed.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.select(
        "_pid",
        (
            F.sum("_n").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("_n")
        ).alias("_off"),
    )
    return local.join(F.broadcast(offsets), "_pid").select(
        *key_cols,
        (F.col("_off") + F.col("_lrank") - 1).cast("long").alias(id_name),
    )


def prefix_sums(
    df: DataFrame,
    key_cols: list[str],
    value_col: str | Column,
    partitions: int = 32,
    start_name: str = "range_start",
) -> DataFrame:
    """(key…, value, range_start) where range_start = sum of ``value``
    over all keys strictly before this one in key order — the
    cumulative-range table behind negative-sampling draws, weighted
    reservoir offsets, and file-offset planning.  Same two-phase shape
    as assign_stable_ids, with per-partition SUMS as the offsets; the
    input must already be one row per key tuple."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    keyed = _with_partition_ranks(
        df.select(*key_cols, v.cast("long").alias("_v")), key_cols, partitions
    )
    local = keyed.withColumn(
        "_lsum",
        F.sum("_v").over(
            Window.partitionBy("_pid")
            .orderBy(*[F.col(c) for c in key_cols])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sums = keyed.groupBy("_pid").agg(F.sum("_v").alias("_s"))
    offsets = sums.select(
        "_pid",
        (
            F.sum("_s").over(
                Window.orderBy("_pid").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            )
            - F.col("_s")
        ).alias("_off"),
    )
    return local.join(F.broadcast(offsets), "_pid").select(
        *key_cols,
        F.col("_v").alias("weight"),
        (F.col("_off") + F.col("_lsum") - F.col("_v"))
        .cast("long")
        .alias(start_name),
    )
