"""Hand-computed fixtures for triangle counting, the Bloom semi-join,
and the compact-frame percentile gate."""

import os

import pytest
from pyspark.sql import functions as F

from surfactant_spark.operators.graphquery import triangle_counts
from surfactant_spark.operators.skew import bloom_semi_join

SF = "/root/testdata/sf0.001"


def test_triangle_counts_k4_plus_isolated_edge(spark):
    # K4 on {1,2,3,4}: every node sits in C(3,2)=3 triangles.
    # Edge (8,9) is triangle-free -> zero counts, but still reported.
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    e = spark.createDataFrame(k4 + [(8, 9)], ["src", "dst"])
    got = {r.node: r.n_tri for r in triangle_counts(e).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 8: 0, 9: 0}


def test_triangle_counts_ignores_dups_loops_and_direction(spark):
    # one triangle expressed with duplicate, reversed, and self-loop
    # edges — the canonicalization must reduce it to 3 simple edges
    e = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (2, 3)], ["src", "dst"]
    )
    got = {r.node: r.n_tri for r in triangle_counts(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_partition_invariant(spark):
    e = spark.range(300).select(
        (F.col("id") % 37).alias("src"), ((F.col("id") * 11 + 5) % 37).alias("dst")
    )
    one = sorted(map(tuple, triangle_counts(e).collect()))
    two = sorted(map(tuple, triangle_counts(e.repartition(13)).collect()))
    assert one == two and len(one) > 0


def test_bloom_semi_join_equals_plain_semi_join(spark):
    big = spark.range(5000).select(
        (F.col("id") % 701).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(40).select((F.col("id") * 17 + 3).alias("sk"))
    got = sorted(map(tuple, bloom_semi_join(big, small, "k", "sk").collect()))
    want = sorted(
        map(
            tuple,
            big.join(
                small.select(F.col("sk").alias("k")).distinct(), "k", "left_semi"
            ).collect(),
        )
    )
    assert got == want and len(got) > 0


@pytest.mark.skipif(not os.path.exists(SF), reason="driver testdata missing")
def test_quality_percentile_keep_semantics(spark):
    from surfactant_spark.queries import q_quality_percentile

    rows = q_quality_percentile(spark, SF).collect()
    n = len(rows)
    kept = [r for r in rows if r.keep]
    dropped = [r for r in rows if not r.keep]
    k = (n + 9) // 10
    # tie-inclusive top decile: at least ceil(n/10) kept, and every kept
    # score strictly dominates every dropped score
    assert len(kept) >= k
    if dropped:
        assert min(r.score_u for r in kept) >= max(r.score_u for r in dropped)
    # strictly-better-count semantics
    for r in kept:
        assert r.n_gt < k
