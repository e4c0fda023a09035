"""Round-7 optimization internals: the graph loops' round-0 folds and
sparse score frames must be output-identical to the dense formulation."""

from surfactant_spark.operators.graphquery import (
    bfs_distances,
    hits_int,
    label_propagation,
    pagerank_int,
    personalized_pagerank_int,
    type_closure,
)


def test_hits_sparse_single_iteration_keeps_zero_nodes(spark):
    # one iteration exercises the round-0 fold (in-degree * scale) and
    # the final left-join: pure-source 'a' (auth 0) and pure-sink 'c'
    # (hub 0) must still be emitted with explicit zeros.
    e = spark.createDataFrame([("a", "b"), ("a", "c"), ("b", "c")], ["src", "dst"])
    got = {r.node: (r.hub_u, r.auth_u) for r in hits_int(e, iterations=1).collect()}
    # a_raw: b=1M c=2M -> auth b=500000 c=1000000
    # h_raw: a=1.5M b=1M -> hub a=1000000 b=666666
    assert got == {
        "a": (1_000_000, 0),
        "b": (666_666, 500_000),
        "c": (0, 1_000_000),
    }


def test_pagerank_round0_fold_matches_hand_values(spark):
    # single iteration isolates the folded round: contribution is
    # r0 div outdeg without a rank join.
    e = spark.createDataFrame([(1, 2), (1, 3), (3, 2)], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank_int(e, iterations=1).collect()}
    # base = 150000; s(2) = 500000 + 1000000, s(3) = 500000
    assert got == {
        1: 150_000,
        2: 150_000 + (85 * 1_500_000) // 100,
        3: 150_000 + (85 * 500_000) // 100,
    }


def test_ppr_round0_fold_ignores_out_of_graph_and_sink_seeds(spark):
    e = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    # seed 3 is a sink (no out-edges), seed 99 is not in the graph at
    # all — both must contribute nothing in the folded round 0.
    seeds = spark.createDataFrame([(1,), (3,), (99,)], ["node"])
    got = {
        r.node: r.rank
        for r in personalized_pagerank_int(e, seeds, iterations=1).collect()
    }
    # seed_base = 150000 on {1,3}; round0: only seed 1 pushes 1M to 2
    assert got == {
        1: 150_000,
        2: (85 * 1_000_000) // 100,
        3: 150_000,
    }


def test_bfs_frontier_dedups_and_ignores_back_edges(spark):
    # diamond a->{b,c}->d plus a back-edge d->a: d is reached twice in
    # the same round (one dist row, not two) and the round-3 candidate
    # a must not re-enter dist (anti-join path).
    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a")],
        ["src", "dst"],
    )
    seeds = spark.createDataFrame([("a",)], ["node"])
    rows = bfs_distances(e, seeds, max_rounds=4).collect()
    assert len(rows) == len({r.node for r in rows})  # unique per node
    assert {r.node: r.dist for r in rows} == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_label_prop_single_round_hand_values(spark):
    # one round exercises the round-0 identity fold: each node takes
    # its most frequent (tie -> smallest) neighbor ID.
    e = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], ["src", "dst"])
    got = {
        r.node: r.label
        for r in label_propagation(e, rounds=1).collect()
    }
    assert got == {1: 2, 2: 1, 3: 1}


def test_type_closure_depth_stays_bigint(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "c")], ["child", "parent"])
    out = type_closure(e, max_depth=4)
    assert dict(out.dtypes)["depth"] == "bigint"
    got = {(r.node, r.anc): r.depth for r in out.collect()}
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 2}
