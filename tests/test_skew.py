"""Skew primitives: hot-key isolation must be result-identical to the
plain join/agg (salting changes the physical plan, never the answer)."""

from pyspark.sql import functions as F

from surfactant_spark.operators.skew import (
    find_hot_keys,
    salted_groupby_sets,
    skew_aware_join,
)


def _skewed_dfs(spark):
    # 2000 probe rows, key 'hot' holds 40%
    probe = spark.range(2000).select(
        F.when(F.col("id") % 5 <= 1, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 97).cast("string")))
        .alias("k"),
        F.col("id").alias("v"),
    )
    build = probe.select("k").distinct().withColumn("meta", F.concat(F.lit("m-"), "k"))
    return probe, build


def test_find_hot_keys(spark):
    probe, _ = _skewed_dfs(spark)
    hot = find_hot_keys(probe, "k", hot_share=0.2)
    assert hot == ["hot"]


def test_find_hot_keys_exact_no_sampling(spark):
    """The full-column sketch finds BORDERLINE hot keys a row sample
    can miss, ranks by true frequency, drops freqItems false
    positives, and respects max_keys."""
    rows = (
        [("h1",)] * 400 + [("h2",)] * 300 + [("h3",)] * 250
        + [(f"c{i}",) for i in range(100)]
    )
    df = spark.createDataFrame(rows, "k string")
    assert find_hot_keys(df, "k", hot_share=0.2) == ["h1", "h2", "h3"]
    assert find_hot_keys(df, "k", hot_share=0.2, max_keys=2) == ["h1", "h2"]
    # share just above every cold key but below the hot ones
    assert find_hot_keys(df, "k", hot_share=0.35) == ["h1"]
    # no hot keys at all → empty, and empty frame → empty
    flat = spark.createDataFrame([(f"u{i}",) for i in range(200)], "k string")
    assert find_hot_keys(flat, "k", hot_share=0.05) == []
    assert find_hot_keys(flat.limit(0), "k") == []


def test_skew_aware_join_matches_plain(spark):
    probe, build = _skewed_dfs(spark)
    plain = probe.join(build, "k")
    skew = skew_aware_join(probe, build, "k", hot_keys=["hot"])
    assert plain.count() == skew.count() == 2000
    diff = plain.exceptAll(skew.select(plain.columns)).count()
    assert diff == 0


def test_skew_join_auto_detection_path(spark):
    probe, build = _skewed_dfs(spark)
    skew = skew_aware_join(probe, build, "k")  # auto hot-key sketch
    assert skew.count() == 2000


def test_salted_groupby_sets_matches_plain(spark):
    probe, _ = _skewed_dfs(spark)
    plain = probe.groupBy("k").agg(F.array_sort(F.collect_set("v")).alias("vs"))
    salted = salted_groupby_sets(probe, ["k"], "v", "vs", buckets=8)
    assert plain.join(salted, "k").where(plain["vs"] != salted["vs"]).count() == 0
    assert plain.count() == salted.count()


def test_bloom_predicate_string_keys(spark):
    """Non-numeric string keys: the r5 BIGINT normalization cast every
    string to NULL so all probe rows hashed identically and the filter
    passed everything.  Keys now hash as strings — every true match
    passes AND the filter actually rejects non-members."""
    from surfactant_spark.operators.skew import bloom_predicate, bloom_semi_join

    small = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",)], ["k"]
    )
    big = spark.createDataFrame(
        [(f"key-{i}",) for i in range(500)] + [("alpha",), ("gamma",)], ["k"]
    )
    pred = bloom_predicate(small, "k", "k", m=4096)
    candidates = big.where(pred)
    n_cand = candidates.count()
    # no false negatives: both true matches survive
    assert {r.k for r in candidates.collect()} >= {"alpha", "gamma"}
    # the pre-filter does real work on string keys (not a pass-everything
    # no-op): FP rate at m=4096, k=3, n=3 is well under 1%
    assert n_cand < 50
    out = bloom_semi_join(big, small, "k", "k", m=4096)
    assert sorted(r.k for r in out.collect()) == ["alpha", "gamma"]
