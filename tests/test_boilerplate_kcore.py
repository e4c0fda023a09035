"""Hand-computed fixtures for corpus boilerplate removal, k-core
peeling, and the host-graph collapse."""

from pyspark.sql import functions as F

from surfactant_spark.operators.dedup import remove_boilerplate_chunks
from surfactant_spark.operators.graphquery import (
    collapse_to_host_graph,
    kcore_peel,
)


def test_boilerplate_removes_shared_chunks_everywhere(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b x y"),
            (3, "p q r s"),
            (4, "a b"),  # every chunk is boilerplate -> empty output
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.clean_text, r.n_kept)
        for r in remove_boilerplate_chunks(
            docs, chunk_tokens=2, min_doc_freq=2
        ).collect()
    }
    # "a b" occurs in docs 1, 2, 4 -> stripped from ALL of them,
    # including the first occurrence (unlike passage dedup)
    assert got == {
        1: ("c d", 1),
        2: ("x y", 1),
        3: ("p q r s", 2),
        4: ("", 0),
    }


def test_boilerplate_preserves_chunk_order(spark):
    # doc 1 has a boilerplate chunk in the MIDDLE; the survivors must
    # re-join in original position order
    docs = spark.createDataFrame(
        [(1, "k1 k2 a b k3 k4"), (2, "a b z9")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r.clean_text
        for r in remove_boilerplate_chunks(
            docs, chunk_tokens=2, min_doc_freq=2
        ).collect()
    }
    assert got[1] == "k1 k2 k3 k4"
    assert got[2] == "z9"


def test_boilerplate_partition_invariant(spark):
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared header text here w"),
            (F.col("id") % 7).cast("string"),
            F.lit(" tail w"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    one = sorted(
        map(tuple, remove_boilerplate_chunks(docs, chunk_tokens=3).collect())
    )
    two = sorted(
        map(
            tuple,
            remove_boilerplate_chunks(
                docs.repartition(13), chunk_tokens=3
            ).collect(),
        )
    )
    assert one == two and len(one) == 200


def test_kcore_triangle_survives_pendant_dies(spark):
    # triangle {1,2,3} plus pendant edge (3,4): k=2 peels node 4 (deg
    # 1) and its edge in round 1; the triangle is a true 2-core
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], ["src", "dst"]
    )
    got = {r.node: r.deg for r in kcore_peel(e, k=2, rounds=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_chain_fully_peels(spark):
    # a path graph has no 2-core; 3 rounds empty it completely
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["src", "dst"]
    )
    assert kcore_peel(e, k=2, rounds=3).count() == 0


def test_kcore_fixed_rounds_partial_peel(spark):
    # rounds=1 on the path graph removes only the endpoint edges —
    # fixed-round semantics, not fixpoint
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["src", "dst"]
    )
    got = {r.node: r.deg for r in kcore_peel(e, k=2, rounds=1).collect()}
    assert got == {2: 1, 3: 2, 4: 1}


def test_host_graph_collapse_weights(spark):
    links = spark.createDataFrame(
        [
            ("http://a.com/p1", "http://b.com/x"),
            ("http://a.com/p1", "http://b.com/y"),  # same pair, same page
            ("http://a.com/p2", "http://b.com/x"),  # same pair, new page
            ("http://a.com/p1", "http://a.com/p2"),  # self-loop pair kept
            ("https://c.com/q", "http://b.com/x"),  # https host parses too
        ],
        ["src_url", "dst_url"],
    )
    got = {
        (r.src_host, r.dst_host): (r.n_links, r.n_src_pages)
        for r in collapse_to_host_graph(links).collect()
    }
    assert got == {
        ("a.com", "b.com"): (3, 2),
        ("a.com", "a.com"): (1, 1),
        ("c.com", "b.com"): (1, 1),
    }
