"""Merge invariants — the tests/cmd/test_merge.py analog: union of
software + union of edges with any-hash dedup and UUID remap."""

from pyspark.sql import functions as F

from surfactant_spark.operators.merge import (
    graph_roots,
    hash_collision_check,
    merge_graphs,
)
from surfactant_spark.schema import EDGES_SCHEMA, NODES_SCHEMA


def _nodes(spark, rows):
    return spark.createDataFrame(rows, NODES_SCHEMA)


def _edges(spark, rows):
    return spark.createDataFrame(rows, EDGES_SCHEMA)


def test_merge_dedups_by_hash_and_remaps_edges(spark):
    # snapshot A: node n1 (sha X) ← e1 ; snapshot B: node n2 (same sha X)
    na = _nodes(spark, [
        ("p:n1", "page", "X", ["t1"], ["u1"], "en", {"captureStart": "2024"}),
        ("e:aa", "entity", None, ["alpha"], [], "en", {}),
    ])
    ea = _edges(spark, [("p:n1", "Uses", "e:aa", "en")])
    nb = _nodes(spark, [
        ("p:n2", "page", "X", ["t1b"], ["u2"], "en", {"captureStart": "2023"}),
        ("h:hh", "host", None, ["h.org"], [], "en", {}),
    ])
    eb = _edges(spark, [("h:hh", "Contains", "p:n2", "en"),
                        ("p:n2", "Uses", "e:aa", "en")])

    nodes, edges = merge_graphs(na, ea, nb, eb)
    nrows = {r.canonical_id: r for r in nodes.collect()}
    # n1/n2 merged under min id p:n1
    assert "p:n2" not in nrows and "p:n1" in nrows
    m = nrows["p:n1"]
    assert list(m.urls) == ["u1", "u2"]
    assert list(m.names) == ["t1", "t1b"]
    assert m.attrs["captureStart"] == "2023"  # per-key min
    # edges remapped to keeper + deduped
    erows = {(r.subj, r.pred, r.obj) for r in edges.collect()}
    assert erows == {("p:n1", "Uses", "e:aa"), ("h:hh", "Contains", "p:n1")}


def test_merge_any_hash_chain(spark):
    """The reference's chained any-hash case (surfactant/sbomtypes/
    _sbom.py:451-490, tests/cmd/test_merge.py:48-56 shape): a matches b
    on sha256, b matches c on md5 — all three entries collapse into ONE
    node through the connected-components pass, and every hash value
    survives on the keeper so later merges can keep chaining."""
    schema = ("canonical_id string, node_type string, sha256 string, "
              "sha1 string, md5 string, names array<string>, "
              "urls array<string>, lang string, attrs map<string,string>")
    na = spark.createDataFrame(
        [
            ("p:a", "page", "SHA_X", None, None, ["a"], ["ua"], "en", {}),
            ("p:b", "page", "SHA_X", None, "MD5_Y", ["b"], ["ub"], "en", {}),
        ],
        schema,
    )
    nb = spark.createDataFrame(
        [
            ("p:c", "page", None, "SHA1_Z", "MD5_Y", ["c"], ["uc"], "en", {}),
            ("p:d", "page", None, None, None, ["d"], ["ud"], "en", {}),
        ],
        schema,
    )
    ea = _edges(spark, [("p:b", "Uses", "p:d", "en")])
    eb = _edges(spark, [("p:c", "Uses", "p:d", "en")])
    nodes, edges = merge_graphs(na, ea, nb, eb)
    nrows = {r.canonical_id: r for r in nodes.collect()}
    assert set(nrows) == {"p:a", "p:d"}  # a,b,c collapse onto min id p:a
    keeper = nrows["p:a"]
    assert (keeper.sha256, keeper.sha1, keeper.md5) == ("SHA_X", "SHA1_Z", "MD5_Y")
    assert list(keeper.names) == ["a", "b", "c"]
    erows = {(r.subj, r.pred, r.obj) for r in edges.collect()}
    assert erows == {("p:a", "Uses", "p:d")}  # both edges remap + dedup


def test_merge_idempotent(spark):
    na = _nodes(spark, [("p:a", "page", "S", ["t"], ["u"], "en", {})])
    ea = _edges(spark, [("p:a", "Uses", "e:x", "en")])
    n1, e1 = merge_graphs(na, ea, na, ea)
    assert n1.count() == 1 and e1.count() == 1


def test_hash_collision_check(spark):
    nodes = _nodes(spark, [
        ("p:a", "page", "S", [], [], "en", {}),
        ("p:b", "page", "S", [], [], "en", {}),
        ("p:c", "page", "T", [], [], "en", {}),
    ])
    rows = hash_collision_check(nodes).collect()
    assert len(rows) == 1 and rows[0].sha256 == "S" and rows[0].n_ids == 2


def test_graph_roots(spark):
    nodes = _nodes(spark, [
        ("h:r", "host", None, [], [], "en", {}),
        ("p:a", "page", "S", [], [], "en", {}),
    ])
    edges = _edges(spark, [("h:r", "Contains", "p:a", "en")])
    roots = {r.canonical_id for r in graph_roots(nodes, edges).collect()}
    assert roots == {"h:r"}
