"""Skew-aware join and aggregation primitives.

The corpus is deliberately skewed (one host owns ~30% of urls, one
entity appears on ~30% of pages — FIXTURES.md §1), and at 10^12 docs
AQE's runtime skew splitting alone is not the contract
(SURVEY.md §4 "Custom"): hot keys are detected explicitly and isolated.

Two primitives:

* ``skew_aware_join`` — big probe ⋈ big build equi-join where a few
  probe keys are heavy hitters.  A cheap sampled count sketch finds the
  hot keys; the build rows for those keys are tiny (keys are few) so
  the hot slice runs as a broadcast join (no shuffle of the heavy probe
  rows at all), while the cold remainder takes the normal shuffle path.
* ``salted_groupby_sets`` — two-stage aggregation for set-collection on
  skewed keys: partial ``collect_set`` on (key, salt), then merge —
  bounds per-task state for the hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def find_hot_keys(
    df: DataFrame,
    key: str,
    hot_share: float = 0.01,
    max_keys: int = 64,
) -> list:
    """Heavy-hitter detection over the FULL column, no row sample.

    Pass 1: ``df.stat.freqItems`` — Spark's frequent-items sketch
    (the Karp/Shenker/Papadimitriou one-pass algorithm): bounded
    per-partition state (≤ 1/hot_share counters), merged without a
    shuffle, with the superset guarantee that every key of share >
    ``hot_share`` is among the candidates (false positives possible,
    false negatives not).  Pass 2: one conditional groupBy that folds
    every non-candidate row into a single NULL group — map-side
    combine leaves ≤ |candidates|+1 rows per partition on the wire —
    yielding exact candidate counts and the total in the same job, so
    false positives drop and survivors rank by true frequency.

    Row-sampled probes were purged from the tree in r4/r5 (stats.py
    documents the bias: sampling at fraction f sees a k-duplicated
    value ~(kf)²/2, so borderline-hot keys vanish); this is the
    ``column_stats``-style full-column replacement the same lesson
    demands for skew detection."""
    support = max(hot_share, 1e-4)  # freqItems' documented lower bound
    (cands_row,) = df.stat.freqItems([key], support=support).collect()
    cands = [c for c in (cands_row[0] or []) if c is not None]
    if not cands:
        return []
    counted = (
        df.select(
            F.when(F.col(key).isin(cands), F.col(key)).alias("_k")
        )
        .groupBy("_k")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in counted)
    if total == 0:
        return []
    hot = [
        (r["count"], r["_k"])
        for r in counted
        if r["_k"] is not None and r["count"] > total * hot_share
    ]
    return [k for _c, k in sorted(hot, reverse=True)[:max_keys]]


def skew_aware_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    how: str = "inner",
    hot_keys: list | None = None,
) -> DataFrame:
    """Equi-join robust to heavy-hitter probe keys.

    Hot slice: probe rows with hot keys ⋈ broadcast(build rows with hot
    keys) — no shuffle of hot rows.  Cold slice: ordinary shuffle join
    (AQE may still rebalance residual mild skew).
    """
    if hot_keys is None:
        hot_keys = find_hot_keys(probe, key)
    if not hot_keys:
        return probe.join(build, key, how)
    # Null-safe slicing: `isin` evaluates to NULL for NULL keys, which
    # both `where(is_hot)` and `where(~is_hot)` would exclude — silently
    # dropping null-key probe rows that an outer join must preserve.
    is_hot = F.coalesce(F.col(key).isin(hot_keys), F.lit(False))
    hot_out = probe.where(is_hot).join(F.broadcast(build.where(is_hot)), key, how)
    cold_out = probe.where(~is_hot).join(build.where(~is_hot), key, how)
    return hot_out.unionByName(cold_out)


def salted_groupby_sets(
    df: DataFrame,
    key_cols: list[str],
    set_col: str,
    out_col: str,
    buckets: int = 16,
) -> DataFrame:
    """``groupBy(key).collect_set(col)`` with a salt pre-aggregation so a
    hot key's set is built across ``buckets`` tasks before the merge.

    Result arrays are sorted → deterministic regardless of salting."""
    salt = F.pmod(F.xxhash64(F.col(set_col)), F.lit(buckets)).alias("_salt")
    partial = (
        df.select(*key_cols, F.col(set_col), salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.collect_set(set_col).alias("_part"))
    )
    return (
        partial.groupBy(*key_cols)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("_part")))
            ).alias(out_col)
        )
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m: int = 4096,
    seeds: tuple[int, ...] = (11, 23, 37),
) -> DataFrame:
    """Semi-join of a huge probe table against a small key set with a
    **Bloom-filter pre-filter** — the runtime-filter / DPP pattern made
    explicit (Spark's own InjectRuntimeFilter does this for some plans;
    at 100 TB you want it guaranteed, not heuristic).

    Build side: the small table's keys are hashed into an m-bit Bloom
    bitmap on the driver (the collected frame is ≤ m distinct bit
    positions, never the raw keys).  Probe side: the bitmap travels to
    executors as ONE parsed SQL literal (py4j-cheap, r4 lesson), and
    rows whose k positions aren't all set are dropped INSIDE the scan's
    codegen stage — before any shuffle.  Bloom filters have no false
    negatives, so a final exact broadcast left-semi join yields a
    result identical to the plain semi-join (the oracle), while the
    shuffle/exchange volume is cut to the false-positive rate.
    """
    pos_cols = [
        F.pmod(F.xxhash64(F.col(small_key), F.lit(s)), F.lit(m)).cast("int")
        for s in seeds
    ]
    positions = sorted(
        r[0]
        for r in small.select(
            F.explode(F.array(*pos_cols)).alias("p")
        ).distinct().collect()
    )
    bits = ["0"] * m
    for p in positions:
        bits[p] = "1"
    bitmap = F.expr("array(" + ",".join(bits) + ")")
    checks = [
        F.element_at(bitmap, F.pmod(F.xxhash64(F.col(big_key), F.lit(s)), F.lit(m)).cast("int") + 1) == 1
        for s in seeds
    ]
    pred = checks[0]
    for c in checks[1:]:
        pred = pred & c
    candidates = big.where(pred)
    keys = small.select(F.col(small_key).alias(big_key)).distinct()
    return candidates.join(F.broadcast(keys), big_key, "left_semi")
