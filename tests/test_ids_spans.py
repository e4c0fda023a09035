"""Unit tests for stable ID assignment, distributed prefix sums,
duplicated-substring spans, keep-best dedup action, negative-sampling
ranges, and community conductance."""

from pyspark.sql import functions as F

from surfactant_spark.operators.dedup import (
    duplicate_spans,
    keep_best_per_group,
)
from surfactant_spark.operators.graphquery import community_conductance
from surfactant_spark.operators.ids import assign_stable_ids, prefix_sums


def test_assign_stable_ids_dense_and_ordered(spark):
    df = spark.createDataFrame(
        [("b",), ("a",), ("c",), ("a",)], ["k"]
    ).repartition(4)
    got = {r.k: r.uid for r in assign_stable_ids(df, ["k"]).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_assign_stable_ids_partition_invariant(spark):
    rows = [(f"k{i:03d}",) for i in range(200)]
    a = spark.createDataFrame(rows, ["k"]).repartition(1)
    b = spark.createDataFrame(list(reversed(rows)), ["k"]).repartition(16)
    ga = {r.k: r.uid for r in assign_stable_ids(a, ["k"], partitions=4).collect()}
    gb = {r.k: r.uid for r in assign_stable_ids(b, ["k"], partitions=8).collect()}
    assert ga == gb
    assert sorted(ga.values()) == list(range(200))


def test_prefix_sums_cumulative(spark):
    df = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 7)], ["k", "v"]
    )
    got = {r.k: (r.weight, r.range_start)
           for r in prefix_sums(df, ["k"], "v", partitions=2).collect()}
    assert got == {"a": (5, 0), "b": (3, 5), "c": (7, 8)}


def test_duplicate_spans_merges_adjacent(spark):
    # doc 0 and 1 share tokens 1..6 ("a b c d e f") → with k=3 the
    # dup 3-gram starts are 1..4, one merged span start=1 len=6
    df = spark.createDataFrame(
        [(0, "a b c d e f zz qq ww"), (1, "a b c d e f yy xx vv")],
        ["doc_id", "text"],
    )
    got = {(r.doc_id, r.span_start, r.span_len)
           for r in duplicate_spans(df, k=3).collect()}
    assert got == {(0, 1, 6), (1, 1, 6)}


def test_duplicate_spans_within_doc_repeat_counts(spark):
    # the same 3-gram twice INSIDE one doc is a duplicate too
    df = spark.createDataFrame(
        [(0, "p q r zz ww p q r")], ["doc_id", "text"]
    )
    got = {(r.span_start, r.span_len)
           for r in duplicate_spans(df, k=3).collect()}
    assert got == {(1, 3), (6, 3)}


def test_duplicate_spans_gap_splits(spark):
    # shared prefix and shared suffix, unique middle → two spans
    df = spark.createDataFrame(
        [(0, "a b c m1 m2 m3 m4 x y z"), (1, "a b c n1 n2 n3 n4 x y z")],
        ["doc_id", "text"],
    )
    got = {(r.span_start, r.span_len)
           for r in duplicate_spans(df, k=3).collect() if r.doc_id == 0}
    assert got == {(1, 3), (8, 3)}


def test_keep_best_per_group_one_winner(spark):
    long = " ".join(f"tok{i} w{i%7} common words here" for i in range(20))
    near = long + " extra"
    df = spark.createDataFrame(
        [(1, long), (2, near), (3, "totally different content xyz abc def")],
        ["doc_id", "text"],
    )
    rows = keep_best_per_group(df).collect()
    by_group = {}
    for r in rows:
        by_group.setdefault(r.group_id, []).append(r)
    for g, members in by_group.items():
        assert sum(m.kept for m in members) == 1
    # 1 and 2 are near-dups; 2 has one more token so it wins
    r = {x.doc_id: x for x in rows}
    if r[1].group_id == r[2].group_id:
        assert r[2].kept and not r[1].kept


def test_community_conductance_counts(spark):
    # two triangles joined by one edge
    edges = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
         ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
         ("a1", "b1")],
        ["src", "dst"],
    )
    labels = spark.createDataFrame(
        [(n, n[0]) for n in ["a1", "a2", "a3", "b1", "b2", "b3"]],
        ["node", "label"],
    )
    got = {r.label: r for r in community_conductance(edges, labels).collect()}
    assert got["a"].internal_edges == 3 and got["a"].cut_edges == 1
    assert got["b"].internal_edges == 3 and got["b"].cut_edges == 1
    # conductance = floor(1*1000/7) = 142
    assert got["a"].conductance_x1000 == 142


def test_community_conductance_isolated_label_null(spark):
    edges = spark.createDataFrame([("a1", "a2")], ["src", "dst"])
    labels = spark.createDataFrame(
        [("a1", "a"), ("a2", "a"), ("z1", "z")], ["node", "label"]
    )
    got = {r.label: r for r in community_conductance(edges, labels).collect()}
    assert got["z"].internal_edges == 0 and got["z"].cut_edges == 0
    assert got["z"].conductance_x1000 is None


def test_pack_sequences_offsets_and_blocks(spark):
    from surfactant_spark.operators.ids import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g"), (3, ""), (4, "h i")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.n_tokens, r.tok_offset, r.first_seq, r.last_seq)
           for r in pack_sequences(docs, block=4).collect()}
    # stream: doc1 [0..2], doc2 [3..6], doc3 empty at 7, doc4 [7..8]
    assert got[1] == (3, 0, 0, 0)
    assert got[2] == (4, 3, 0, 1)   # spans blocks 0 and 1
    assert got[3] == (0, 7, None, None)
    assert got[4] == (2, 7, 1, 2)


def test_lsh_eval_perfect_on_exact_dups(spark):
    from surfactant_spark.operators.dedup import lsh_eval

    long = " ".join(f"w{i} tok{i%11} filler{i%7}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, long), (2, long), (3, "completely different text entirely"),
         (4, "another unrelated document body here")],
        ["doc_id", "text"],
    )
    r = lsh_eval(docs, min_jaccard_x1000=900).collect()[0]
    # identical docs: the (1,2) pair is both truth and LSH candidate
    assert r.tp == 1 and r.fn == 0
    assert r.recall_x1000 == 1000


def test_equi_depth_bins_exact_boundaries(spark):
    from surfactant_spark.stats import equi_depth_bins

    # values 1..100: quartile boundaries at ranks 25/50/75
    df = spark.createDataFrame([(i,) for i in range(1, 101)], ["v"])
    got = {r.bin_idx: r.boundary
           for r in equi_depth_bins(df, "v", bins=4).collect()}
    assert got == {1: 25, 2: 50, 3: 75}


def test_equi_depth_bins_duplicates_and_skew(spark):
    from surfactant_spark.stats import equi_depth_bins

    # heavy duplication: 90x value 7, 10x value 99
    rows = [(7,)] * 90 + [(99,)] * 10
    df = spark.createDataFrame(rows, ["v"]).repartition(8)
    got = {r.bin_idx: r.boundary
           for r in equi_depth_bins(df, "v", bins=4).collect()}
    assert got == {1: 7, 2: 7, 3: 7}


def test_equi_depth_bins_small_n_raises(spark):
    import pytest
    from surfactant_spark.stats import equi_depth_bins

    df = spark.createDataFrame([(1,), (2,)], ["v"])
    with pytest.raises(ValueError, match="at least bins"):
        equi_depth_bins(df, "v", bins=4)


def test_length_outliers_integer_exact(spark):
    from surfactant_spark.stats import length_outliers

    # group en: nine 10-token docs + one 100-token doc (clear outlier)
    docs = [(i, "t " * 10, "en") for i in range(9)]
    docs.append((9, "t " * 100, "en"))
    df = spark.createDataFrame(docs, ["doc_id", "text", "lang"])
    got = {r.doc_id: r.is_outlier for r in length_outliers(df).collect()}
    assert got[9] is True
    assert all(got[i] is False for i in range(9))


def test_materialize_sequences_exact_stream(spark):
    import hashlib

    from surfactant_spark.operators.ids import materialize_sequences

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g"), (3, ""), (4, "h i")],
        ["doc_id", "text"],
    )
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    got = {(r.seq_id, r.seq_len, r.seq_fp)
           for r in materialize_sequences(docs, block=4).collect()}
    # stream a b c d | e f g h | i
    assert got == {
        (0, 4, md5("a b c d")), (1, 4, md5("e f g h")), (2, 1, md5("i"))
    }
