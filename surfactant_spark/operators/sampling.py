"""Deterministic corpus sampling for training-data pipelines.

A sampler at 10^12 rows must be (a) reproducible across runs AND
engines regardless of partitioning, (b) a pure row predicate — no
shuffle, no state, pushdown-eligible — and (c) stratifiable per
group.  `df.sample()` fails (a): its Bernoulli draw depends on
partition layout and the engine's RNG.  These operators key every
decision on md5 of a salted id, so the identical sample replays
anywhere (the same md5-derived determinism the dedup family uses for
its oracles; the reference itself has no sampler — it scans
everything — but the graft's training-data tier needs one).

* :func:`hash_sample` — keep ≈ rate fraction of rows (16-bit hash
  threshold); changing the salt draws an independent sample.
* :func:`stratified_sample` — per-stratum rates (e.g. downsample
  English, keep all low-resource languages), one predicate, no
  shuffle.
* :func:`group_topk_by_hash` — exactly k rows per group, chosen by
  hash order: the distributed fixed-size-per-group subsample (the
  reservoir-sampling use case) as one window over the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_SPACE = 1 << 16  # 16-bit sampling space: rate = threshold / 65536


def sample_key(key: Column, salt: str = "s0") -> Column:
    """Uniform value in [0, 65536) from md5(salt|key) — identical in
    any engine (DuckDB: ('0x' || substr(md5(...), 1, 4))::BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), key.cast("string"))), 1, 4),
        16, 10,
    ).cast("long")


def hash_sample(
    df: DataFrame, key_col: str, threshold_x65536: int, salt: str = "s0"
) -> DataFrame:
    """≈ threshold/65536 of rows, deterministically.  Pure predicate:
    whole-stage codegen, no shuffle, safe under any repartitioning."""
    return df.where(sample_key(F.col(key_col), salt) < threshold_x65536)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates_x65536: dict[str, int],
    default_x65536: int,
    key_col: str,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum hash sampling: stratum s keeps ≈ rates[s]/65536 of
    its rows (default for unlisted strata).  Still one predicate — the
    rate map compiles to a literal CASE, so no join, no shuffle."""
    rate = F.lit(default_x65536)
    for s, r in sorted(rates_x65536.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(r)).otherwise(rate)
    return df.where(sample_key(F.col(key_col), salt) < rate)


def group_topk_by_hash(
    df: DataFrame, group_col: str, key_col: str, k: int, salt: str = "s0"
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, selected by (hash, key)
    order — a fixed-budget-per-group subsample whose membership is a
    pure function of the keys.  One shuffle on the group column; skew
    caveat: a hot group costs one reducer its full scan (rows beyond
    rank k are discarded map-side only with AQE skew handling), which
    is inherent to exact per-group budgets."""
    from pyspark.sql.window import Window

    h = sample_key(F.col(key_col), salt)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= k)
        .drop("_rank")
    )


def mixture_weights(
    docs,
    group_col: str,
    target_ppm: dict[str, int],
    text_col: str = "text",
):
    """Domain-mixture reweighting (the DoReMi/data-mixing primitive):
    given a target share per group (parts-per-million), compute the
    per-group sampling weight that transforms the corpus's CURRENT
    token distribution into the target one:

        weight_ppm(g) = (target_ppm[g] * total_tokens) div tokens(g)

    Integer-exact (one floor division on BIGINTs — engine-portable);
    a weight of 1,000,000 means "sample at natural rate", above means
    upsample, below means downsample.  Groups absent from the target
    map get weight 0 (dropped domains).

    100-TB shape: one partial-agg groupBy over the corpus (token
    counts combine map-side), a 1-row total broadcast back over the
    tiny per-group frame — the corpus is read once and never joined.
    The output composes with ``hash_sample``: sample group g at
    ``min(1, weight_ppm/1e6)`` via the deterministic md5 predicate.
    """
    from pyspark.sql import functions as F

    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.size(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).cast("long").alias("n_toks"),
    )
    per_group = toks.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
    )
    total = per_group.agg(F.sum("n_tokens").alias("total_tokens"))
    return (
        per_group.crossJoin(F.broadcast(total))
        .select(
            "grp",
            "n_docs",
            "n_tokens",
            F.expr(
                "CAST(coalesce(element_at("
                + "map("
                + ",".join(
                    f"'{k}',{v}L" for k, v in sorted(target_ppm.items())
                )
                + "), grp), 0L) * total_tokens div n_tokens AS BIGINT)"
            ).alias("weight_ppm"),
        )
    )


def group_aware_split(
    df: DataFrame,
    group_col: str,
    splits: list[tuple[str, int]] | None = None,
    salt: str = "split0",
) -> DataFrame:
    """Leakage-free train/val/test assignment: the split key is the
    md5 of the GROUP label (e.g. a near-dup cluster id), not the
    document id, so every member of a duplicate family lands in the
    same split — the standard guard against train→test contamination
    through near-duplicates (naive per-doc hashing leaks: two 95 %-
    identical pages split across train and test are a measured-eval
    lie).  ``splits`` are (name, weight) pairs; assignment is
    ``md5(salt|group) % Σweights`` mapped to cumulative ranges —
    deterministic, engine-replayable, a pure codegen projection (no
    shuffle beyond whatever produced the group labels)."""
    splits = splits or [("train", 8), ("val", 1), ("test", 1)]
    total = sum(w for _, w in splits)
    bucket = sample_key(F.col(group_col), salt) % total
    expr = None
    acc = 0
    for name, w in splits:
        cond = bucket < F.lit(acc + w)
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
        acc += w
    return df.withColumn("split", expr)
