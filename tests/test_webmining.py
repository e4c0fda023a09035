"""Unit tests for the round-5 web-mining operators: URL templating,
frontier scheduling, corpus CUBE, pattern SVO extraction, event
transitions, and deterministic random walks."""

from pyspark.sql import functions as F

from surfactant_spark.functions.extract import url_template
from surfactant_spark.operators.crawl import schedule_frontier
from surfactant_spark.operators.indexing import corpus_cube
from surfactant_spark.operators.structdata import extract_svo
from surfactant_spark.operators.temporal import event_transitions
from surfactant_spark.operators.walks import random_walks


def test_url_template_collapses_ids(spark):
    df = spark.createDataFrame(
        [
            ("/p/deadbeef42aa/item17?v=3",),
            ("/p/0123456789ab/item900?v=12",),
            ("/blog/2024/post-7",),
            ("/about/team",),
        ],
        ["url"],
    )
    got = {
        r.t for r in df.select(url_template(F.col("url")).alias("t")).collect()
    }
    assert got == {"/p/H/itemN?v=N", "/blog/N/post-N", "/about/team"}


def test_url_template_short_hex_stays_digits_only(spark):
    # 7 hex chars is below the 8-char id threshold: only the digit
    # runs collapse, letters survive.
    df = spark.createDataFrame([("/x/abc1234/y",)], ["url"])
    [r] = df.select(url_template(F.col("url")).alias("t")).collect()
    assert r.t == "/x/abcN/y"


def test_schedule_frontier_caps_per_host_then_global(spark):
    rows = [
        ("h1", f"u{i:02d}", 100 - i) for i in range(5)
    ] + [("h2", f"v{i:02d}", 50 - i) for i in range(4)]
    df = spark.createDataFrame(rows, ["host", "url", "score"])
    out = schedule_frontier(df, per_host_k=3, global_n=4).collect()
    # per-host: h1 keeps u00-u02, h2 keeps v00-v02; global top-4 by
    # score desc = h1's three (100,99,98) + h2's best (50).
    assert [(r.host, r.url) for r in out] == [
        ("h1", "u00"),
        ("h1", "u01"),
        ("h1", "u02"),
        ("h2", "v00"),
    ]


def test_schedule_frontier_tie_break_is_url_asc(spark):
    df = spark.createDataFrame(
        [("h", "b", 7), ("h", "a", 7), ("h", "c", 7)],
        ["host", "url", "score"],
    )
    out = schedule_frontier(df, per_host_k=2, global_n=10).collect()
    assert [r.url for r in out] == ["a", "b"]


def test_corpus_cube_grouping_sets(spark):
    df = spark.createDataFrame(
        [("en", "web", 10), ("en", "pdf", 20), ("fr", "web", 30)],
        ["lang", "source", "n_chars"],
    )
    got = {
        (r.lang, r.source): (r.n_docs, r.total_size)
        for r in corpus_cube(df).collect()
    }
    assert got[("ALL", "ALL")] == (3, 60)
    assert got[("en", "ALL")] == (2, 30)
    assert got[("ALL", "web")] == (2, 40)
    assert got[("fr", "web")] == (1, 30)
    assert len(got) == 8  # 3 observed pairs + 2 langs + 2 sources + 1 total


def test_extract_svo_matches_and_skips(spark):
    df = spark.createDataFrame(
        [
            (1, "The Engine uses fuel. lowercase never matches. "
                "Widget2 contains a bolt."),
            (2, "no capital subject here. Alice was an engineer!"),
        ],
        ["doc_id", "text"],
    )
    got = {(r.doc_id, r.subj, r.rel, r.obj) for r in extract_svo(df).collect()}
    assert got == {
        (1, "Engine", "uses", "fuel"),
        (1, "Widget2", "contains", "bolt"),
        (2, "Alice", "was", "engineer"),
    }


def test_event_transitions_counts_and_tie_break(spark):
    df = spark.createDataFrame(
        [
            ("u1", 1, "view", 10),
            ("u1", 2, "cart", 11),
            ("u1", 2, "buy", 12),  # same ts as cart: event_id orders
            ("u2", 5, "view", 20),
            ("u2", 6, "view", 21),
        ],
        ["user_id", "ts", "event_type", "event_id"],
    )
    got = {
        (r.prev_type, r.event_type): r.n
        for r in event_transitions(df).collect()
    }
    assert got == {
        ("view", "cart"): 1,
        ("cart", "buy"): 1,
        ("view", "view"): 1,
    }


def test_random_walks_deterministic_and_sink_safe(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "e")],
        ["src", "dst"],
    )
    w1 = {(r.start, r.stop, r.walk) for r in random_walks(edges, 3).collect()}
    w2 = {(r.start, r.stop, r.walk) for r in random_walks(edges, 3).collect()}
    assert w1 == w2  # same salt → identical corpus on re-run
    assert {r[0] for r in w1} == {"a", "b", "c", "d"}
    # every hop in a walk is a real edge; sinks stop growing
    adj = {("a"): {"b", "c"}, "b": {"c"}, "c": {"a"}, "d": {"e"}}
    for start, stop, walk in w1:
        path = walk.split(">")
        assert path[0] == start and path[-1] == stop
        for u, v in zip(path, path[1:]):
            assert v in adj.get(u, set())
    # 'd' walks to sink 'e' then stays
    d_walk = next(w for w in w1 if w[0] == "d")
    assert d_walk[1] == "e" and d_walk[2] == "d>e"


def test_random_walks_different_salt_differs(spark):
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + j) % 50}") for i in range(50) for j in (1, 2, 3)],
        ["src", "dst"],
    )
    a = {(r.start, r.walk) for r in random_walks(edges, 4, salt="w0").collect()}
    b = {(r.start, r.walk) for r in random_walks(edges, 4, salt="w1").collect()}
    assert a != b
