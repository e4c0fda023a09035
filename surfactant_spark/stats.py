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
    """``(n_rows, n_distinct)`` for ``col``, one agg job.

    Distinctness is xxhash64-based: a 64-bit collision under-counts by
    ~n²/2⁶⁵ — negligible at any corpus size this probe feeds (the
    numbers drive heuristics and caps, not results).  With
    ``sample_fraction`` the counts are SAMPLE counts — use their ratio
    (dup rate), not their magnitudes."""
    if cache_key is not None and cache_key in _CACHE:
        return _CACHE[cache_key]
    src = df.select(F.xxhash64(F.col(col)).alias("_h"))
    if sample_fraction:
        src = src.sample(fraction=sample_fraction, seed=42)
    row = src.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("_h").alias("d")
    ).collect()[0]
    out = (int(row["n"]), int(row["d"]))
    if cache_key is not None:
        _CACHE[cache_key] = out
    return out


def dup_rate(stats: tuple[int, int]) -> float:
    """Duplicate fraction implied by ``(n, distinct)``; 0.0 on empty."""
    n, d = stats
    return 0.0 if n == 0 else 1.0 - d / n
