"""Shared corpus-statistics pass.

Several operators make an adaptive path choice from the same two
numbers — row count and (approximate) distinct count of one column:

* mentions.content_for_detection — dedup-before-detect vs detect-all
* similarity.lsh_near_pairs — direct vs flood (compaction) path
* similarity.lsh_topk / adaptive_lsh_bits — LSH table width

Round 3 computed these independently (three scans); this module is the
single implementation, with (a) a caller-supplied ``stats`` escape
hatch on every consumer so a pipeline that already knows its corpus
shape pays zero probe jobs, and (b) a process-level memo keyed by a
caller-chosen identity (e.g. a table path) so co-resident operators
share one scan.  The probe itself is ONE narrow agg job: xxhash64 of
the column, count + countDistinct with map-side partial aggregation —
the column's bytes never shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CACHE: dict[object, tuple[int, int]] = {}


def column_stats(
    df: DataFrame,
    col: str,
    sample_fraction: float | None = None,
    cache_key: object = None,
) -> tuple[int, int]:
    """``(n_rows, n_distinct)`` for ``col``, one agg job over the FULL
    column.

    Distinctness is an HLL sketch (``approx_count_distinct``, rsd 2%):
    sketches merge map-side, so the probe never shuffles more than a
    few KB per partition at any corpus size, and a ±2% distinct count
    is ample for the heuristics and caps it feeds.

    ``sample_fraction`` exists for callers that cannot afford even a
    one-column scan, but know the BIAS: row sampling destroys duplicate
    structure — at fraction f, a value duplicated k times is seen twice
    with probability ≈ (kf)²/2, so uniform low-k duplication (the
    2-4× url-variant duplication of a real crawl) reads as ~0% and only
    heavy hot-page duplication registers.  The full-column sketch has
    no such bias; prefer it (measured: a 75%-duplicated corpus sampled
    at 2% estimated <1% dup and silently disabled the dedup path)."""
    if cache_key is not None and cache_key in _CACHE:
        return _CACHE[cache_key]
    src = df.select(F.col(col).alias("_c"))
    if sample_fraction:
        src = src.sample(fraction=sample_fraction, seed=42)
    row = src.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("_c", rsd=0.02).alias("d"),
    ).collect()[0]
    # the sketch can overestimate distinct past the row count (rsd
    # noise); clamp so consumers can rely on d ≤ n
    out = (int(row["n"]), min(int(row["n"]), int(row["d"])))
    if cache_key is not None:
        _CACHE[cache_key] = out
    return out


def dup_rate(stats: tuple[int, int]) -> float:
    """Duplicate fraction implied by ``(n, distinct)``; 0.0 on empty.
    Clamped at 0 (the HLL sketch can overestimate distinct by ~rsd)."""
    n, d = stats
    return 0.0 if n == 0 else max(0.0, 1.0 - d / n)


def equi_depth_bins(
    df: DataFrame,
    value_col: str,
    bins: int = 10,
    partitions: int = 32,
) -> DataFrame:
    """Exact equi-depth histogram boundaries of a numeric column —
    the CBO/skew statistic approxQuantile approximates, computed
    EXACTLY and engine-portably: boundary i (1-based, i = 1..bins-1)
    is the value at global sorted rank ceil(i*n/bins) over ALL rows
    (duplicates included).  Output (bin_idx, boundary).

    Shape: the two-phase rank machinery (range partition + per-
    partition counts + broadcast offsets — operators/ids.py), then a
    filter to the bins-1 boundary ranks; ties are irrelevant because
    only the VALUE at a rank is emitted and the multiset is sorted.
    ``n`` is one count job (metadata-scale, like every N-scalar in
    this repo).  No single-partition sort, no driver-side data."""
    from pyspark.sql import Window

    n = df.count()
    if n == 0 or bins < 2:
        return df.sparkSession.createDataFrame(
            [], "bin_idx long, boundary long"
        )
    if n < bins:
        raise ValueError(
            f"equi_depth_bins: need at least bins={bins} rows, got {n} "
            "(boundary ranks would collide)"
        )
    ranks = [(i * n + bins - 1) // bins for i in range(1, bins)]
    v = df.select(F.col(value_col).cast("long").alias("_v"))
    keyed = (
        v.repartitionByRange(partitions, F.col("_v"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    local = keyed.withColumn(
        "_lrank",
        F.row_number().over(Window.partitionBy("_pid").orderBy("_v")),
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
    ranked = local.join(F.broadcast(offsets), "_pid").select(
        "_v", (F.col("_off") + F.col("_lrank")).alias("_r")
    )
    rank_to_bin = F.create_map(
        *[x for r_, b in zip(ranks, range(1, bins)) for x in (F.lit(r_), F.lit(b))]
    )
    return (
        ranked.where(F.col("_r").isin(ranks))
        .select(
            rank_to_bin[F.col("_r")].cast("long").alias("bin_idx"),
            F.col("_v").alias("boundary"),
        )
    )


def length_outliers(
    docs: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    z: int = 2,
) -> DataFrame:
    """Documents whose token count deviates more than ``z`` standard
    deviations from their group's mean — the cheap corpus-anomaly
    filter — decided ENTIRELY in integer arithmetic, no sqrt, no
    float: |len−μ| > z·σ  ⇔  (len·n − sum)² > z²·(n·sumsq − sum²),
    so the verdict is bit-identical across engines and aggregation
    orders.  Output (id, group, n_tokens, is_outlier).

    Shape: one partial-agg groupBy for the per-group (n, sum, sumsq)
    moment frame (dimension-sized → BROADCAST joined back), one
    projection for the verdict."""
    lens = docs.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.size(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).cast("long").alias("n_tokens"),
    )
    moments = lens.groupBy("grp").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("n_tokens").alias("_s"),
        F.sum(F.col("n_tokens") * F.col("n_tokens")).alias("_ss"),
    )
    d = F.col("n_tokens") * F.col("_n") - F.col("_s")
    var_n2 = F.col("_n") * F.col("_ss") - F.col("_s") * F.col("_s")
    return lens.join(F.broadcast(moments), "grp").select(
        F.col("id").alias(id_col),
        F.col("grp").alias(group_col),
        "n_tokens",
        (d * d > F.lit(z * z) * var_n2).alias("is_outlier"),
    )
