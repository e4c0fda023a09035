"""Resource-allocation link prediction + multi-source BFS fixtures."""

from surfactant_spark.operators.graphquery import (
    bfs_distances,
    resource_allocation_pairs,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_ra_scores_integer_exact(spark):
    # z1 shared by a,b (deg 2); z2 shared by a,b,c (deg 3)
    e = _edges(spark, [
        ("a", "z1"), ("b", "z1"),
        ("a", "z2"), ("b", "z2"), ("c", "z2"),
        ("a", "z2"),  # duplicate edge: must not double-count
    ])
    rows = {(r.node_a, r.node_b): (r.common, r.score)
            for r in resource_allocation_pairs(e).collect()}
    third = 10**9 // 3
    assert rows[("a", "b")] == (2, 10**9 // 2 + third)
    assert rows[("a", "c")] == (1, third)
    assert rows[("b", "c")] == (1, third)
    # pairs are unordered: only (min, max) orientation emitted
    assert ("b", "a") not in rows


def test_ra_neighbor_cap_keeps_full_degree_weight(spark):
    # z has sources a,b,c,d (deg 4); cap 2 keeps only sorted-first
    # {a,b} for expansion but the weight must still be scale DIV 4
    e = _edges(spark, [("a", "z"), ("b", "z"), ("c", "z"), ("d", "z")])
    rows = resource_allocation_pairs(e, max_neighbors=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.node_a, r.node_b, r.score) == ("a", "b", 10**9 // 4)


def test_ra_min_common_filter(spark):
    e = _edges(spark, [
        ("a", "z1"), ("b", "z1"), ("a", "z2"), ("b", "z2"),
        ("a", "z3"), ("c", "z3"),
    ])
    rows = {(r.node_a, r.node_b)
            for r in resource_allocation_pairs(e, min_common=2).collect()}
    assert rows == {("a", "b")}


def test_bfs_multi_source_min_and_bound(spark):
    #  s1 → x → y → z → w ;  s2 → z  (z closer via s2)
    e = _edges(spark, [
        ("s1", "x"), ("x", "y"), ("y", "z"), ("z", "w"), ("s2", "z"),
    ])
    seeds = spark.createDataFrame([("s1",), ("s2",)], ["node"])
    d = {r.node: r.dist
         for r in bfs_distances(e, seeds, max_rounds=4).collect()}
    assert d == {"s1": 0, "s2": 0, "x": 1, "y": 2, "z": 1, "w": 2}
    # bounded rounds: w (min dist 2) vanishes at max_rounds=1
    d1 = {r.node: r.dist
          for r in bfs_distances(e, seeds, max_rounds=1).collect()}
    assert d1 == {"s1": 0, "s2": 0, "x": 1, "z": 1}


def test_bfs_unreachable_absent_and_cycle_safe(spark):
    e = _edges(spark, [("a", "b"), ("b", "a"), ("lone1", "lone2")])
    seeds = spark.createDataFrame([("a",)], ["node"])
    d = {r.node: r.dist
         for r in bfs_distances(e, seeds, max_rounds=5).collect()}
    assert d == {"a": 0, "b": 1}
