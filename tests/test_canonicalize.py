"""Union-find connected components — chains, stars, isolated keys.
The distributed analog of Surfactant's dedup-merge canonical election
(surfactant/sbomtypes/_sbom.py:219-263); FIXTURES.md §3 shapes."""

import hashlib

from surfactant_spark.operators.canonicalize import connected_components, entity_canonical_map


def _sha(s):
    return hashlib.sha256(s.encode()).hexdigest()


def test_cc_chain_and_isolated(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["a", "b"]
    )
    got = {(r.node, r.component) for r in connected_components(edges).collect()}
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"),
        ("x", "x"), ("y", "x"),
    }


def test_cc_giant_star(spark):
    n = 500
    rows = [("hub", f"spoke{i:04d}") for i in range(n)]
    edges = spark.createDataFrame(rows, ["a", "b"])
    comp = connected_components(edges)
    labels = {r.component for r in comp.collect()}
    assert labels == {"hub"}
    assert comp.count() == n + 1


def test_cc_long_path_converges_by_pointer_jumping(spark):
    # path of 33 nodes: min-label alone needs 32 rounds; with pointer
    # jumping it must converge within max_iter=8
    rows = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(32)]
    edges = spark.createDataFrame(rows, ["a", "b"])
    comp = connected_components(edges, max_iter=8)
    labels = {r.component for r in comp.collect()}
    assert labels == {"n00"}


def test_star_cc_matches_pointer_jumping(spark):
    """large-star/small-star CC must produce the identical (node,
    component) map as the min-label/pointer-jumping variant on mixed
    shapes: chain + clique + giant skewed star + isolated pair."""
    from surfactant_spark.operators.canonicalize import connected_components_star

    rows = [(f"c{i}", f"c{i+1}") for i in range(12)]                 # chain
    rows += [(f"k{i}", f"k{j}") for i in range(5) for j in range(i)]  # clique
    rows += [("hub", f"s{i:03d}") for i in range(300)]                # skewed star
    rows += [("p", "q"), ("q", "p")]                                  # dup/reverse
    edges = spark.createDataFrame(rows, ["a", "b"])
    a = {(r.node, r.component) for r in connected_components(edges).collect()}
    b = {(r.node, r.component) for r in connected_components_star(edges).collect()}
    assert a == b and len({c for _, c in a}) == 4


def test_star_cc_long_path(spark):
    from surfactant_spark.operators.canonicalize import connected_components_star

    rows = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(32)]
    comp = connected_components_star(spark.createDataFrame(rows, ["a", "b"]), max_iter=10)
    labels = {r.component for r in comp.collect()}
    assert labels == {"n00"} and comp.count() == 33


def test_entity_canonical_map_min_sha_election(spark):
    emap = entity_canonical_map(
        spark,
        dict_keys=["k1", "k2", "solo"],
        alias_edge_rows=[("k1", "k2")],
    )
    rows = {r.entity_key: (r.canonical_id, tuple(r.member_keys)) for r in emap.collect()}
    expected_canon = "e:" + min(_sha("k1"), _sha("k2"))
    assert rows["k1"] == (expected_canon, ("k1", "k2"))
    assert rows["k2"] == (expected_canon, ("k1", "k2"))
    assert rows["solo"] == ("e:" + _sha("solo"), ("solo",))


def test_cc_deep_chain_all_paths_agree(spark):
    # a 25-node chain is the worst case for label propagation (deep
    # diameter); the driver fast path, the distributed min-label
    # fixpoint (fused convergence probe), and large-star/small-star
    # must produce identical components
    rows = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(24)]
    edges = spark.createDataFrame(rows, ["a", "b"])
    a = {(r.node, r.component) for r in connected_components(edges).collect()}
    b = {
        (r.node, r.component)
        for r in connected_components(edges, small_threshold=0).collect()
    }
    assert a == b
    from surfactant_spark.operators.canonicalize import connected_components_star

    c = {
        (r.node, r.component)
        for r in connected_components_star(edges, small_threshold=0).collect()
    }
    assert a == c


def test_cc_warns_on_max_iter_exhaustion(spark):
    import warnings as w

    from surfactant_spark.operators.canonicalize import connected_components_star

    # a 65-node path cannot flatten in 1 round for either variant
    rows = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(64)]
    edges = spark.createDataFrame(rows, ["a", "b"])
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        connected_components(edges, max_iter=1, small_threshold=0).collect()
        assert any("no convergence" in str(x.message) for x in rec)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        connected_components_star(edges, max_iter=1, small_threshold=0).collect()
        assert any("no convergence" in str(x.message) for x in rec)


def test_small_graph_fast_path_parity(spark):
    """The driver union-find fast path must be row-identical to BOTH
    distributed fixpoints on the same graph (the adaptive cutover can
    never change results), and the limit-probe must leave big graphs on
    the distributed path."""
    from surfactant_spark.operators.canonicalize import (
        _small_graph_labels,
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y"), ("z", "z"), ("q", "x")],
        "a string, b string",
    )
    fast = {(r.node, r.component) for r in
            connected_components(edges).collect()}
    dist = {(r.node, r.component) for r in
            connected_components(edges, small_threshold=0).collect()}
    star = {(r.node, r.component) for r in
            connected_components_star(edges, small_threshold=0).collect()}
    assert fast == dist == star
    assert fast == {("a", "a"), ("b", "a"), ("c", "a"),
                    ("x", "q"), ("y", "q"), ("q", "q")}
    # probe: threshold below the edge count → fast path declines
    assert _small_graph_labels(edges, "a", "b", 2) is None
    # int-typed node ids keep their type through the fast path
    iedges = spark.createDataFrame([(2, 1), (3, 2)], "a int, b int")
    got = {(r.node, r.component) for r in
           connected_components(iedges).collect()}
    assert got == {(1, 1), (2, 1), (3, 1)}
