"""Unit tests for personalized PageRank, clustering coefficients,
bounded weighted distances, co-citation pairs, and entity salience."""

from pyspark.sql import functions as F

from surfactant_spark.operators.graphquery import (
    clustering_coefficients,
    cocitation_pairs,
    pagerank_int,
    personalized_pagerank_int,
    weighted_distances,
)
from surfactant_spark.operators.indexing import entity_salience


def test_ppr_mass_concentrates_on_seeds(spark):
    # chain hub -> a -> b -> c, seed = hub: rank decays with distance
    # from the seed (each hop multiplies by damping)
    e = spark.createDataFrame(
        [("hub", "a"), ("a", "b"), ("b", "c")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("hub",)], ["node"])
    got = {r.node: r.rank
           for r in personalized_pagerank_int(e, seeds).collect()}
    # bit-exact integer trace after 3 iterations: the seed holds only
    # its teleport base (no inflow), a holds 0.85·base, b 0.85²·base,
    # and c (dangling) still carries the initial-mass wave
    assert got == {"hub": 150000, "a": 127500, "b": 108375, "c": 614125}


def test_ppr_all_seeds_equals_pagerank(spark):
    e = spark.createDataFrame(
        [(i, (i * 3 + 1) % 7) for i in range(7)], ["src", "dst"]
    )
    all_nodes = e.select(F.col("src").alias("node")).unionByName(
        e.select(F.col("dst").alias("node"))
    )
    pr = {r.node: r.rank for r in pagerank_int(e).collect()}
    ppr = {r.node: r.rank
           for r in personalized_pagerank_int(e, all_nodes).collect()}
    assert pr == ppr


def test_clustering_coefficients_triangle_plus_tail(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")], ["src", "dst"]
    )
    got = {r.node: r for r in clustering_coefficients(e).collect()}
    # b, c: deg 2, 1 triangle -> 2*1*1000/2 = 1000
    assert got["b"].cc_x1000 == 1000
    # a: deg 3, 1 triangle -> floor(2000/6) = 333
    assert got["a"].cc_x1000 == 333
    # d: deg 1 -> NULL
    assert got["d"].cc_x1000 is None
    assert got["d"].n_tri == 0


def test_weighted_distances_picks_min_path(spark):
    # a->b (5), a->c (1), c->b (1): dist(a,b) = 2 via c
    e = spark.createDataFrame(
        [("a", "b", 5), ("a", "c", 1), ("c", "b", 1)], ["src", "dst", "w"]
    )
    got = {(r.src, r.dst): r.dist
           for r in weighted_distances(e, rounds=2).collect()}
    assert got[("a", "b")] == 2
    assert got[("a", "c")] == 1
    assert got[("c", "b")] == 1


def test_weighted_distances_hop_bound(spark):
    # chain of 6 unit edges; rounds=2 covers <= 4 hops
    e = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(6)], ["src", "dst", "w"]
    )
    got = {(r.src, r.dst): r.dist
           for r in weighted_distances(e, rounds=2).collect()}
    assert got[(0, 4)] == 4
    assert (0, 5) not in got  # 5 hops > bound
    full = {(r.src, r.dst): r.dist
            for r in weighted_distances(e, rounds=3).collect()}
    assert full[(0, 6)] == 6


def test_cocitation_counts_shared_targets(spark):
    e = spark.createDataFrame(
        [("a", "t1"), ("b", "t1"), ("a", "t2"), ("b", "t2"),
         ("c", "t2"), ("a", "t3"), ("c", "t3")],
        ["src", "dst"],
    )
    got = {(r.a, r.b): r.n_shared
           for r in cocitation_pairs(e, min_count=1).collect()}
    assert got[("a", "b")] == 2
    assert got[("a", "c")] == 2
    assert got[("b", "c")] == 1


def test_cocitation_fanin_cap_deterministic(spark):
    rows = [(f"s{i:02d}", "hub") for i in range(10)]
    e = spark.createDataFrame(rows, ["src", "dst"])
    got = cocitation_pairs(e, min_count=1, max_fanin=3).collect()
    # cap 3 smallest sources -> C(3,2) = 3 pairs
    assert len(got) == 3
    assert {(r.a, r.b) for r in got} == {
        ("s00", "s01"), ("s00", "s02"), ("s01", "s02")
    }


def test_entity_salience_position_and_tf(spark):
    df = spark.createDataFrame(
        [(1, "data early words filler data end"),
         (2, "filler filler filler filler data")],
        ["doc_id", "text"],
    )
    got = {(r.doc_id, r.term): r for r in
           entity_salience(df, ["data"]).collect()}
    r1 = got[(1, "data")]
    assert (r1.tf, r1.first_pos) == (2, 1)
    # n=6: tf part 2*1000//6=333, pos part (6-1+1)*1000//6=1000
    assert r1.salience_x1000 == 1333
    r2 = got[(2, "data")]
    assert (r2.tf, r2.first_pos) == (1, 5)
    # n=5: 1*1000//5=200, (5-5+1)*1000//5=200
    assert r2.salience_x1000 == 400
