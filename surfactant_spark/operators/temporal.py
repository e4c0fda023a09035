"""Temporal / interval operators Spark lacks as built-ins — as-of
join, binned range join, multi-resolution time rollup — each expressed
as a composition of DataFrame ops (no UDF, no nested-loop join).

These generalize the reference's event-ordered diagnostics (capture
windows, session grouping) to the operators a training-data pipeline
needs over event streams; the reference has no native analogs, so the
designs are Spark-first (SURVEY.md §2.8 extension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload: list[str],
    right_ts_alias: str = "asof_ts",
) -> DataFrame:
    """As-of join: for every left row, the single most recent right row
    with ``right.ts <= left.ts`` in the same ``on`` group (inclusive
    backward match; NULL payload when no prior right row exists).

    Implementation is the union-tag-window formulation, NOT a join:
    tag right rows 0 and left rows 1, union, then one window per
    ``on`` group ordered by (ts, tag) carrying
    ``last(payload, ignorenulls)`` over an unbounded-preceding frame.
    Exactly ONE shuffle (by the group key) and a per-partition sort —
    the same cost as a groupBy — where a naive inequality join is a
    per-group cross product.  At equal timestamps the right row sorts
    first, making the match inclusive and deterministic.

    Right rows must be unique per (on, ts) — pre-dedup with a groupBy
    picking a deterministic representative, or ties are resolved
    arbitrarily.  100-TB shape: the window never materializes a
    group in memory (running ``last`` is streaming within the sorted
    partition); skewed groups can be range-repartitioned by (on, ts)
    since the frame is unbounded-preceding only.
    """
    lcols = left.columns
    # a right row with NULL ts would sort before everything (ASC NULLS
    # FIRST) and be carried as the "most recent prior" payload for left
    # rows that should match nothing — drop it before the union
    right = right.where(F.col(ts).isNotNull())
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_tag"),
        F.col(ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
    )
    l = left.select(
        *lcols,
        F.lit(1).alias("_tag"),
        F.lit(None).cast(r.schema["_r_ts"].dataType).alias("_r_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in payload
        ],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *lcols,
        F.col("_tag"),
        F.last("_r_ts", ignorenulls=True).over(w).alias(right_ts_alias),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload
        ],
    )
    return filled.where(F.col("_tag") == 1).drop("_tag")


def range_bin_join(
    points: DataFrame,
    intervals: DataFrame,
    value: str,
    lo: str,
    hi: str,
    bin_width: int,
) -> DataFrame:
    """Interval containment join (point ∈ [lo, hi], integer units)
    without a nested loop: explode each interval onto the integer bins
    it overlaps (``sequence(lo div W, hi div W)``), equi-join on the
    point's bin, then apply the exact containment predicate.

    Catalyst turns a raw ``lo <= v AND v <= hi`` join into
    BroadcastNestedLoopJoin / CartesianProduct — O(n·m) and a plan
    killer at scale.  The binned form is a plain shuffled equi-join:
    cost O(n + m·(span/W)) with full partial-agg/AQE support
    (plan-audited !CartesianProduct !BroadcastNestedLoopJoin).  Pick
    ``bin_width`` near the typical interval span so each interval
    lands on ~1-2 bins; skewed bins fall out of AQE skew-join
    handling like any hot join key.
    """
    pts = points.withColumn("_bin", (F.col(value) / bin_width).cast("long"))
    ivs = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.col(lo) / bin_width).cast("long"),
                (F.col(hi) / bin_width).cast("long"),
            )
        ),
    )
    return (
        pts.join(ivs, "_bin")
        .where((F.col(value) >= F.col(lo)) & (F.col(value) <= F.col(hi)))
        .drop("_bin")
    )


def time_rollup(
    events: DataFrame,
    ts: str,
    keys: list[str],
    aggs: dict[str, Column],
) -> DataFrame:
    """Hypertable-style multi-resolution rollup: aggregate to hour
    buckets from the raw events, then derive the day level FROM THE
    HOUR AGGREGATE (sums of sums), never rescanning the raw table —
    the continuous-aggregate pattern: each coarser resolution is a
    cheap re-agg of the finer one, so a 100-TB raw table is read once.

    ``aggs`` maps output column name → aggregate over the raw frame;
    every aggregate must be re-aggregable by SUM (counts and sums are;
    pass distinct-ish metrics as HLL sketches if needed).  Output:
    (level, bucket, *keys, *aggs) with bucket formatted
    'yyyy-MM-dd HH:mm:ss'.
    """
    hour = events.groupBy(
        F.date_trunc("hour", F.col(ts)).alias("_b"), *keys
    ).agg(*[a.alias(name) for name, a in aggs.items()])
    day = hour.groupBy(
        F.date_trunc("day", F.col("_b")).alias("_b"), *keys
    ).agg(*[F.sum(name).cast("long").alias(name) for name in aggs])
    fmt = lambda df, lvl: df.select(  # noqa: E731
        F.lit(lvl).alias("level"),
        F.date_format("_b", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
        *keys,
        *aggs,
    )
    return fmt(hour, "hour").unionByName(fmt(day, "day"))


def latest_capture(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tie_col: str | None = None,
) -> DataFrame:
    """CDX-style capture collapse: newest capture per CANONICAL URL —
    the crawl-side dedup that precedes content processing (a page
    crawled weekly contributes ONE row downstream).

    URLs are keyed by ``textfx.canonical_url`` so spelling variants of
    one page collapse; within a canonical group the row with the
    greatest ``ts_col`` wins (ties broken by ascending ``tie_col`` for
    full determinism).  Adds ``n_captures`` (group size).

    100-TB shape: one window over the canonical key, which plans as
    WindowGroupLimit (rank-limit pushed below the exchange: each map
    task keeps one candidate row per canonical url before anything
    shuffles) plus a count over the same partition — a single shuffle
    on the canonical key, no join, no driver state.
    """
    from ..functions.textfx import canonical_url
    from ..partitioning import spread

    # canonicalization is ~10 regex ops/row: widen a narrow scan so it
    # doesn't run inside 1-3 tasks (no-op when the scan is already wide)
    df = spread(df, url_col)
    tie = [F.asc(tie_col)] if tie_col else []
    w = Window.partitionBy("canon").orderBy(F.desc(ts_col), *tie)
    wc = Window.partitionBy("canon")
    return (
        df.withColumn("canon", canonical_url(url_col))
        .withColumn("n_captures", F.count(F.lit(1)).over(wc).cast("long"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over per-user event
    streams: (prev_type, event_type, n) for consecutive events —
    clickstream structure mining (which page types lead where), the
    batch analog of the sessionizer (streaming/sessions.py).

    One window (partition by user, order by ts with id tie-break —
    deterministic under equal timestamps) + one partial-agg groupBy.
    The window shuffles by user, which is the natural key: no user's
    stream crosses partitions, so 100-TB scaling is linear in users.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.asc(ts_col), F.asc(id_col)
    )
    return (
        events.select(
            F.lag(type_col).over(w).alias("prev_type"),
            F.col(type_col).alias("event_type"),
        )
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch gap-sessionization: split each user's stream at gaps
    > ``gap_s`` seconds, emit one row per session — (user_id,
    session_no, start ts, end ts, n_events).  The batch twin of the
    streaming sessionizer (streaming/sessions.py): same gap
    semantics, so a backfill and the live path agree.

    Classic two-window formulation: a lag marks session starts, a
    running sum of the marks numbers them — BOTH windows share the
    (user, ts, id) sort, so Catalyst plans ONE Exchange + ONE Sort
    for the pair; the per-session rollup is a partial-agg groupBy.
    """
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    # timestamp subtraction (day-time interval) works for both
    # TIMESTAMP and TIMESTAMP_NTZ; a long cast does not
    prev = F.lag(F.col(ts_col)).over(w)
    gap = F.col(ts_col) - prev
    marked = events.withColumn(
        "_new",
        F.when(
            prev.isNull() | (gap > F.expr(f"INTERVAL {gap_s} SECOND")), 1
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_no", F.sum("_new").over(w).cast("long")
    )
    return numbered.groupBy(user_col, "session_no").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def scd2_intervals(
    snapshots: DataFrame,
    entity_col: str = "entity_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "uid",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval build: collapse an
    entity's observation stream into value-change intervals —
    (entity, value, valid_from, valid_to, is_current), valid_to NULL
    on the open interval.  This is the KG versioning primitive: the
    merge pipeline observes entity attributes per crawl snapshot;
    downstream time-travel queries want intervals, not observations.

    Change points = rows where the value differs from its lag;
    valid_to = the NEXT change point's timestamp (lead over the
    change-point frame).  Both windows partition on the entity key,
    so the whole operator is one Exchange; the change-point filter
    shrinks the frame before the second window's sort.
    """
    w = Window.partitionBy(entity_col).orderBy(F.asc(ts_col), F.asc(id_col))
    chg = (
        snapshots.withColumn("_prev", F.lag(value_col).over(w))
        .where(
            F.col("_prev").isNull()
            | ~F.col("_prev").eqNullSafe(F.col(value_col))
        )
        .drop("_prev")
    )
    w2 = Window.partitionBy(entity_col).orderBy(F.asc(ts_col), F.asc(id_col))
    return chg.select(
        F.col(entity_col).alias("entity_id"),
        F.col(value_col).alias("value"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def capture_drift(
    captures: DataFrame,
    url_col: str = "url",
    order_col: str = "capture_ts",
    id_col: str = "capture_id",
    text_col: str = "text",
) -> DataFrame:
    """Content drift across a web archive: for every capture after a
    url's first, the 64-bit SimHash hamming distance to the PREVIOUS
    capture — the change-detection signal that decides recrawl
    frequency and dedups unchanged snapshots (the CDX family's
    companion: latest_capture picks one, drift measures churn).

    Shape: one simhash64 pass over the capture corpus (explode + one
    64-aggregate groupBy), one equi-join back, one PER-URL lag window
    (partitions are capture-chain-sized).  hamming = bit_count(hi⊕hi')
    + bit_count(lo⊕lo') — pure integer, engine-portable.
    Output (url, capture id, order value, drift_bits)."""
    from pyspark.sql import Window

    from .dedup import simhash64

    fp = simhash64(captures, id_col=id_col, text_col=text_col)
    base = captures.select(url_col, order_col, id_col).join(fp, id_col)
    w = Window.partitionBy(url_col).orderBy(order_col)
    lagged = base.select(
        url_col,
        order_col,
        id_col,
        "sh_hi",
        "sh_lo",
        F.lag("sh_hi").over(w).alias("_ph"),
        F.lag("sh_lo").over(w).alias("_pl"),
    )
    return lagged.where(F.col("_ph").isNotNull()).select(
        url_col,
        id_col,
        order_col,
        (
            F.bit_count(F.col("sh_hi").bitwiseXOR(F.col("_ph")))
            + F.bit_count(F.col("sh_lo").bitwiseXOR(F.col("_pl")))
        ).cast("long").alias("drift_bits"),
    )


def frecency_scores(
    events: DataFrame,
    ref_date: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    half_life_days: int = 7,
) -> DataFrame:
    """Frecency (frequency × recency) ranking in EXACT integer
    arithmetic: each event contributes 1_000_000 >> (age_days div
    half_life) — a power-of-two decay staircase instead of the float
    2^(-age/λ) exponential, so scores are bit-identical across
    engines and aggregation orders while preserving the halving-per-
    half-life semantics.  Contributions beyond 30 half-lives clamp to
    0-ish (shift capped) rather than overflowing.

    One partial-agg groupBy over the event stream; ``ref_date`` is an
    explicit parameter (not now()) so runs are reproducible.  Output
    (user, n_events, frecency)."""
    age = F.datediff(F.lit(ref_date).cast("date"), F.col(ts_col).cast("date"))
    bucket = F.least(
        F.floor(age / half_life_days).cast("int"), F.lit(30)
    )
    staged = events.select(
        F.col(user_col).alias("user"), age.alias("_age"), bucket.alias("_b")
    )
    # pyspark's shiftright only takes a LITERAL bit count — the
    # column-valued shift has to go through the SQL expression
    contrib = F.when(F.col("_age") < 0, F.lit(0)).otherwise(
        F.expr("1000000 div (cast(1 as bigint) << _b)")
    )
    return staged.groupBy("user").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(contrib).cast("long").alias("frecency"),
    )
