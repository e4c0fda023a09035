"""Unit tests for the round-5 third KG-operator batch: conjunctive
BGP match, RDFS type entailment, bounded SCC, and GraphSAGE-style
neighbor feature aggregation."""

import pytest

from surfactant_spark.operators.graphquery import (
    entail_types,
    match_bgp,
    neighbor_feature_agg,
    scc_components,
)


def _edges(spark, triples):
    return spark.createDataFrame(triples, ["subj", "pred", "obj"])


def test_match_bgp_two_hop(spark):
    e = _edges(
        spark,
        [
            ("u1", "placed", "o1"),
            ("u1", "placed", "o2"),
            ("u2", "placed", "o3"),
            ("o1", "contains", "p1"),
            ("o2", "contains", "p2"),
            ("o3", "contains", "p1"),
            ("p1", "type", "t1"),
            ("p2", "type", "t2"),
        ],
    )
    got = {
        tuple(r)
        for r in match_bgp(
            e,
            [("u1", "placed", "?o"), ("?o", "contains", "?p"),
             ("?p", "type", "t1")],
        ).collect()
    }
    # columns are sorted var names: (o, p)
    assert got == {("o1", "p1")}


def test_match_bgp_set_semantics_dedups(spark):
    # duplicate edges must not duplicate bindings
    e = _edges(
        spark,
        [("a", "r", "b"), ("a", "r", "b"), ("b", "s", "c")],
    )
    rows = match_bgp(e, [("a", "r", "?x"), ("?x", "s", "?y")]).collect()
    assert [tuple(r) for r in rows] == [("b", "c")]


def test_match_bgp_rejects_disconnected(spark):
    e = _edges(spark, [("a", "r", "b")])
    with pytest.raises(ValueError, match="disconnected"):
        match_bgp(e, [("a", "r", "?x"), ("?y", "s", "?z")])


def test_match_bgp_requires_variables(spark):
    e = _edges(spark, [("a", "r", "b")])
    with pytest.raises(AssertionError):
        match_bgp(e, [("a", "r", "b")])


def test_entail_types_inherits_through_chain(spark):
    sub = spark.createDataFrame(
        [("sedan", "car"), ("car", "vehicle")], ["child", "parent"]
    )
    inst = spark.createDataFrame(
        [("e1", "sedan"), ("e2", "vehicle")], ["entity", "type"]
    )
    got = {tuple(r) for r in entail_types(inst, sub).collect()}
    assert got == {
        ("e1", "sedan"),
        ("e1", "car"),
        ("e1", "vehicle"),
        ("e2", "vehicle"),
    }


def test_entail_types_diamond_dedups(spark):
    # two direct types sharing an ancestor: ancestor appears once
    sub = spark.createDataFrame(
        [("a", "top"), ("b", "top")], ["child", "parent"]
    )
    inst = spark.createDataFrame(
        [("e", "a"), ("e", "b")], ["entity", "type"]
    )
    rows = entail_types(inst, sub).collect()
    assert len(rows) == len({tuple(r) for r in rows}) == 3


def test_scc_ring_plus_tail(spark):
    # 3-cycle a->b->c->a, tail t->a, singleton pair x->y
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("t", "a"), ("x", "y")],
        ["src", "dst"],
    )
    got = {r.node: r.scc_id for r in scc_components(e).collect()}
    assert got == {
        "a": "a", "b": "a", "c": "a", "t": "t", "x": "x", "y": "y"
    }


def test_scc_two_components(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "d"), ("d", "c"), ("b", "c")],
        ["src", "dst"],
    )
    got = {r.node: r.scc_id for r in scc_components(e).collect()}
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c"}


def test_scc_depth_bound_misses_wide_ring(spark):
    # 6-ring with max_depth=3: mutual pairs beyond the bound are
    # missed, so the ring fragments — documents the correctness bound
    ring = [(f"n{i}", f"n{(i + 1) % 6}") for i in range(6)]
    e = spark.createDataFrame(ring, ["src", "dst"])
    full = {r.scc_id for r in scc_components(e, max_depth=8).collect()}
    assert full == {"n0"}
    frag = {r.scc_id for r in scc_components(e, max_depth=3).collect()}
    assert len(frag) > 1


def test_neighbor_feature_agg_sums_and_mean(spark):
    e = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("a", "y")], ["src", "dst"]
    )
    feats = spark.createDataFrame(
        [("a", 10), ("b", 3)], ["node", "f"]
    )
    got = {r.node: r for r in neighbor_feature_agg(e, feats, ["f"]).collect()}
    assert got["x"].n_nbrs == 2
    assert got["x"].f_sum == 13
    assert got["x"].f_max == 10
    assert got["x"].f_mean_x1000 == 6500
    assert got["y"].f_sum == 10


def test_neighbor_feature_agg_multigraph_counts_twice(spark):
    e = spark.createDataFrame([("a", "x"), ("a", "x")], ["src", "dst"])
    feats = spark.createDataFrame([("a", 5)], ["node", "f"])
    row = neighbor_feature_agg(e, feats, ["f"]).collect()[0]
    assert (row.n_nbrs, row.f_sum) == (2, 10)
