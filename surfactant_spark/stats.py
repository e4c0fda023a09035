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
