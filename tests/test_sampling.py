"""Deterministic sampling operators (operators/sampling.py): the
training-data subsampling family — partitioning-independent membership,
per-stratum rates, exact per-group budgets."""

from pyspark.sql import functions as F

from surfactant_spark.operators.sampling import (
    HASH_SPACE,
    group_topk_by_hash,
    hash_sample,
    stratified_sample,
)


def _docs(spark, n=2000, parts=4):
    return spark.range(n, numPartitions=parts).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )


def test_hash_sample_rate_and_partition_independence(spark):
    docs = _docs(spark)
    kept = hash_sample(docs, "doc_id", HASH_SPACE // 4)
    ids = {r.doc_id for r in kept.collect()}
    # ≈ 1/4 of 2000 within loose binomial bounds
    assert 380 <= len(ids) <= 620
    # identical membership under a different partitioning
    ids2 = {r.doc_id for r in
            hash_sample(_docs(spark, parts=13), "doc_id", HASH_SPACE // 4).collect()}
    assert ids == ids2
    # a different salt draws a (mostly) different sample of similar size
    ids3 = {r.doc_id for r in
            hash_sample(docs, "doc_id", HASH_SPACE // 4, salt="s1").collect()}
    assert 380 <= len(ids3) <= 620 and ids3 != ids


def test_stratified_rates(spark):
    docs = _docs(spark)
    kept = stratified_sample(
        docs, "lang", {"en": HASH_SPACE // 8}, HASH_SPACE, "doc_id"
    )
    by_lang = {r["lang"]: r["n"] for r in
               kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # non-'en' strata keep everything; 'en' keeps ≈ 1/8
    assert by_lang["de"] == 667 and by_lang["fr"] == 666
    assert 40 <= by_lang["en"] <= 140
    # stratified with a per-stratum rate ≡ plain hash_sample on that stratum
    en_only = {r.doc_id for r in kept.where("lang = 'en'").collect()}
    direct = {r.doc_id for r in
              hash_sample(docs.where("lang = 'en'"), "doc_id", HASH_SPACE // 8).collect()}
    assert en_only == direct


def test_group_topk_exact_budget(spark):
    docs = _docs(spark)
    got = group_topk_by_hash(docs, "lang", "doc_id", 7)
    counts = {r["lang"]: r["n"] for r in
              got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 7, "de": 7, "fr": 7}
    # membership is a pure function of keys: same result, any partitioning
    got2 = group_topk_by_hash(_docs(spark, parts=11), "lang", "doc_id", 7)
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in got2.collect()}
    # groups smaller than k keep all rows
    tiny = group_topk_by_hash(docs.limit(4), "lang", "doc_id", 7)
    assert tiny.count() == 4
