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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def find_hot_keys(
    df: DataFrame,
    key: str,
    hot_share: float = 0.01,
    max_keys: int = 64,
    exact: bool = True,
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
    if not exact:
        # r7: skip the exact-count confirmation pass (OPT-IN — callers
        # whose downstream output is invariant to the key partition,
        # i.e. skew_aware_join routing).  The sketch's
        # candidate list is a SUPERSET of the truly-hot keys (no false
        # negatives) and is bounded by ~1/hot_share entries, so routing
        # every candidate through the broadcast hot slice costs at most
        # a slightly larger (still key-bounded) broadcast — while the
        # confirmation pass cost a SECOND full scan of the probe side
        # per join (the kg edges stage paid it on the exploded link
        # frame every run).  Join output is identical either way: the
        # hot/cold split is a partition of keys, not a semantic choice.
        # Sorted for a deterministic broadcast list (no cap: dropping a
        # candidate would route a possibly-hot key to the shuffle path);
        # ``exact=True`` restores true-frequency ranking for callers
        # that need the top-``max_keys`` by count.
        return sorted(cands, key=str)
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
        # exact=False: the freqItems superset is enough here — the join
        # result is identical for ANY hot/cold key partition, so the
        # exact-count confirmation scan of the probe side is pure cost
        # (the kg edges stage paid it on the exploded link frame).
        hot_keys = find_hot_keys(probe, key, exact=False)
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
            F.sort_array(
                F.array_distinct(F.flatten(F.collect_list("_part")))
            ).alias(out_col)
        )
    )


def bloom_predicate(
    small: DataFrame,
    small_key: str,
    big_key: str,
    m: int = 4096,
    seeds: tuple[int, ...] = (11, 23, 37),
) -> Column:
    """Build-side half of the Bloom pre-filter: hash the small table's
    keys into an m-bit bitmap on the driver (the collected frame is
    ≤ m distinct bit POSITIONS, never the raw keys) and return a probe
    predicate over ``big_key``.

    The whole predicate is ONE parsed SQL string (py4j-cheap, r4
    lesson) shaped as ``forall(array(h1..hk), h -> bitmap[h%m] = 1)``
    so the bitmap literal appears ONCE in the expression tree, not once
    per hash.  Bloom filters have no false negatives: every true match
    passes; false positives are removed by the exact join that follows.
    """
    # xxhash64 hashes TYPED values: build and probe sides must hash the
    # SAME type or they silently disagree — true matches drop (caught by
    # tools/bloom_audit.py's result-equality assert).  Keys are
    # normalized to STRING on both sides: a BIGINT cast would NULL
    # non-numeric string keys, making every probe hash identical and
    # the pre-filter a silent no-op.  Any key type whose string form is
    # value-stable (ints, strings, dates) is supported; the seed literal
    # stays INT on both sides.
    pos_cols = [
        F.pmod(
            F.xxhash64(F.col(small_key).cast("string"), F.lit(s)), F.lit(m)
        ).cast("int")
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
    hashes = ",".join(
        f"xxhash64(CAST({big_key} AS STRING), {s})" for s in seeds
    )
    return F.expr(
        f"forall(array({hashes}), h -> element_at(array({','.join(bits)}), "
        f"CAST(pmod(h, {m}) AS INT) + 1) = 1)"
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

    Rows whose k bit positions aren't all set are dropped INSIDE the
    scan's stage — before any shuffle — and the final exact broadcast
    left-semi join makes the result identical to the plain semi-join
    (the oracle), while shuffle/exchange volume is cut to the match
    rate plus the Bloom false-positive rate.  When the key set is too
    big to broadcast, compose :func:`bloom_predicate` with a shuffle
    semi-join instead (measured in ``tools/bloom_audit.py``).
    """
    candidates = big.where(
        bloom_predicate(small, small_key, big_key, m=m, seeds=seeds)
    )
    keys = small.select(F.col(small_key).alias(big_key)).distinct()
    return candidates.join(F.broadcast(keys), big_key, "left_semi")
