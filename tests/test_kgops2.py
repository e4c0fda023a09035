"""Unit tests for the round-5 second operator batch: batch
sessionization, SCD-2 intervals, degree histogram, vocabulary
coverage, label centroids, and PSL registrable-domain extraction."""

import datetime as dt

from pyspark.sql import functions as F

from surfactant_spark.operators.crawl import registrable_domain
from surfactant_spark.operators.graphquery import degree_histogram
from surfactant_spark.operators.indexing import vocab_coverage
from surfactant_spark.operators.similarity import label_centroids
from surfactant_spark.operators.temporal import scd2_intervals, sessionize


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_sessionize_splits_on_gap(spark):
    rows = [
        ("u1", _ts("2024-01-01T10:00:00"), 1),
        ("u1", _ts("2024-01-01T10:20:00"), 2),   # 20 min: same session
        ("u1", _ts("2024-01-01T11:00:00"), 3),   # 40 min gap: new
        ("u2", _ts("2024-01-01T09:00:00"), 4),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    got = {
        (r.user_id, r.session_no): (r.n_events, r.session_start, r.session_end)
        for r in sessionize(df, gap_s=1800).collect()
    }
    assert got[("u1", 1)] == (
        2, _ts("2024-01-01T10:00:00"), _ts("2024-01-01T10:20:00")
    )
    assert got[("u1", 2)] == (
        1, _ts("2024-01-01T11:00:00"), _ts("2024-01-01T11:00:00")
    )
    assert got[("u2", 1)][0] == 1


def test_sessionize_exact_gap_is_same_session(spark):
    rows = [
        ("u", _ts("2024-01-01T10:00:00"), 1),
        ("u", _ts("2024-01-01T10:30:00"), 2),  # exactly 1800 s: same
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = sessionize(df, gap_s=1800).collect()
    assert len(out) == 1 and out[0].n_events == 2


def test_scd2_collapses_and_marks_current(spark):
    rows = [
        ("e1", 1, "A", 10),
        ("e1", 2, "A", 11),  # no change: folded into first interval
        ("e1", 3, "B", 12),
        ("e1", 4, "A", 13),  # back to A: NEW interval (not merged)
        ("e2", 1, "X", 14),
    ]
    df = spark.createDataFrame(rows, ["entity_id", "ts", "value", "uid"])
    got = {
        (r.entity_id, r.valid_from): (r.value, r.valid_to, r.is_current)
        for r in scd2_intervals(df).collect()
    }
    assert got[("e1", 1)] == ("A", 3, False)
    assert got[("e1", 3)] == ("B", 4, False)
    assert got[("e1", 4)] == ("A", None, True)
    assert got[("e2", 1)] == ("X", None, True)
    assert len(got) == 4


def test_degree_histogram_buckets(spark):
    # star: hub h has degree 5; spokes degree 1 each
    edges = spark.createDataFrame(
        [("h", f"s{i}") for i in range(5)], ["subj", "obj"]
    )
    got = {r.bucket: (r.lo, r.n_nodes) for r in degree_histogram(edges).collect()}
    assert got[0] == (1, 5)   # five degree-1 spokes
    assert got[2] == (4, 1)   # hub: floor(log2(5)) = 2, lo = 4


def test_vocab_coverage_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "a a b rare1"),
            (2, "a b b rare2 rare3"),
            (3, "zz yy xx"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_in_vocab)
        for r in vocab_coverage(df, vocab_k=2).collect()
    }
    # vocab = {a(3), b(3)}; tie at 3 vs rare/zz(1) irrelevant
    assert got[1] == (4, 3)
    assert got[2] == (5, 3)
    assert got[3] == (3, 0)  # zero-coverage doc still present


def test_label_centroids_exact_sums(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, -0.5], 7),
            (1, [0.25, 0.25], 7),
            (2, [2.0, 2.0], 8),
        ],
        ["vec_id", "embedding", "label"],
    )
    got = {
        (r.label, r.pos): (r.ssum, r.n)
        for r in label_centroids(df).collect()
    }
    assert got[(7, 0)] == (1_250_000, 2)   # 1.0 + 0.25 scaled
    assert got[(7, 1)] == (-250_000, 2)    # floor(-499999.5) + 250000
    assert got[(8, 0)] == (2_000_000, 1)


def test_registrable_domain_rule_classes(spark):
    rules = ["com", "uk", "co.uk", "io", "github.io", "*.ck", "!www.ck"]
    hosts = [
        ("a.b.example.com",),
        ("x.co.uk",),
        ("deep.x.co.uk",),
        ("t.foo.ck",),     # wildcard: public suffix = foo.ck
        ("www.ck",),       # exception: public suffix = ck
        ("u.github.io",),  # private suffix
        ("com",),          # host IS a public suffix → NULL
        ("a.unknown",),    # no rule: default bare TLD
    ]
    df = spark.createDataFrame(hosts, ["host"])
    got = {r.host: r.reg_domain for r in registrable_domain(df, rules).collect()}
    assert got["a.b.example.com"] == "example.com"
    assert got["x.co.uk"] == "x.co.uk"
    assert got["deep.x.co.uk"] == "x.co.uk"
    assert got["t.foo.ck"] == "t.foo.ck"
    assert got["www.ck"] == "www.ck"
    assert got["u.github.io"] == "u.github.io"
    assert got["com"] is None
    assert got["a.unknown"] == "a.unknown"


def test_registrable_domain_duplicate_hosts_keep_rows(spark):
    df = spark.createDataFrame(
        [("x.example.com", 1), ("x.example.com", 2)], ["host", "k"]
    )
    out = registrable_domain(df, ["com"]).collect()
    assert len(out) == 2
    assert all(r.reg_domain == "example.com" for r in out)


def test_ngram_containment_directional(spark):
    from surfactant_spark.operators.dedup import ngram_containment_pairs

    # doc 2's shingle set is a strict subset of doc 1's
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),   # shingles: abc bcd cde def (4)
            (2, "a b c d"),       # shingles: abc bcd (2) — both in doc1
            (3, "x y z w"),       # disjoint
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.id_src, r.id_dst): r.containment_x1000
        for r in ngram_containment_pairs(df, min_containment_x1000=1).collect()
    }
    assert got[(2, 1)] == 1000   # doc2 fully contained in doc1
    assert got[(1, 2)] == 500    # 2 of doc1's 4 shingles shared
    assert (3, 1) not in got and (1, 3) not in got


def test_fellegi_sunter_tiers_and_blocking(spark):
    from surfactant_spark.operators.entityres import fellegi_sunter_scores

    recs = spark.createDataFrame(
        [
            (1, "b0", "acme", 7),
            (2, "b0", "acme", 7),    # exact name + country: 40+20
            (3, "b0", "acmex", 5),   # 1 edit, country differs: 25-15
            (4, "b1", "acme", 7),    # other block: never paired w/ 1-3
            (5, "b0", "zzzzzzzz", 7),  # name miss: -10+20
        ],
        ["rec_id", "block", "name", "country"],
    )
    got = {
        (r.id_a, r.id_b): r.score
        for r in fellegi_sunter_scores(
            recs, exact_fields={"country": (20, -15)}, min_score=-100
        ).collect()
    }
    assert got[(1, 2)] == 60
    assert got[(1, 3)] == 10
    assert got[(1, 5)] == 10
    assert not any(4 in p for p in got)  # blocking respected


def test_type_closure_min_depth(spark):
    from surfactant_spark.operators.graphquery import type_closure

    # chain a->b->c->d plus shortcut a->c: depth(a,c) must be 1
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")],
        ["child", "parent"],
    )
    got = {(r.node, r.anc): r.depth for r in type_closure(e, 8).collect()}
    assert got[("a", "b")] == 1
    assert got[("a", "c")] == 1   # shortcut wins over the 2-hop path
    assert got[("a", "d")] == 2   # via the shortcut
    assert got[("b", "d")] == 2
    assert len(got) == 6  # {a,b,c}×ancestors: 3 + 2 + 1


def test_type_closure_depth_bound(spark):
    from surfactant_spark.operators.graphquery import type_closure

    chain = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(10)], ["child", "parent"]
    )
    got = {(r.node, r.anc): r.depth for r in type_closure(chain, 3).collect()}
    assert got[("n0", "n3")] == 3
    assert ("n0", "n4") not in got  # beyond max_depth


def test_walk_skipgrams_positional(spark):
    from surfactant_spark.operators.walks import walk_skipgrams

    w = spark.createDataFrame([("a>b>a",), ("x>y",)], ["walk"])
    got = {
        (r.center, r.context): r.n for r in walk_skipgrams(w, window=1).collect()
    }
    # positions 1,2,3 = a,b,a; window 1 pairs: (a,b),(b,a),(b,a),(a,b)
    assert got[("a", "b")] == 2
    assert got[("b", "a")] == 2
    assert got[("x", "y")] == 1
    assert got[("y", "x")] == 1
    # a revisited at distance 2 is outside window 1: no (a,a)
    assert ("a", "a") not in got


def test_walk_skipgrams_window2_revisit(spark):
    from surfactant_spark.operators.walks import walk_skipgrams

    w = spark.createDataFrame([("a>b>a",)], ["walk"])
    got = {
        (r.center, r.context): r.n for r in walk_skipgrams(w, window=2).collect()
    }
    assert got[("a", "a")] == 2  # both directions of the revisit pair
