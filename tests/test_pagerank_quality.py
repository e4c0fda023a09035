"""Hand-computed fixtures for the integer-exact PageRank operator and
the feature-hashed quality scorer."""

import hashlib

from pyspark.sql import functions as F

from surfactant_spark.functions.textfx import hashed_quality_score, token_count
from surfactant_spark.operators.graphquery import pagerank_int


def test_pagerank_int_hand_computed(spark):
    # a -> b, b -> a, a -> c   (c is dangling)
    e = spark.createDataFrame([("a", "b"), ("b", "a"), ("a", "c")], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank_int(e, iterations=3).collect()}
    # iter1: S(a)=1000000, S(b)=S(c)=500000
    #   r = base + (85*S) div 100, base = 150000
    # iter2: r(a)=638750, r(b)=r(c)=575000
    # iter3: r(b)=r(c)=150000 + (85*(638750 div 2)) div 100 = 421468
    assert got == {"a": 638750, "b": 421468, "c": 421468}


def test_pagerank_int_dedups_edges_and_is_deterministic(spark):
    e = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("b", "a")], ["src", "dst"]
    )
    one = {r.node: r.rank for r in pagerank_int(e, iterations=2).collect()}
    two = {
        r.node: r.rank
        for r in pagerank_int(e.repartition(7), iterations=2).collect()
    }
    assert one == two
    # duplicate a->b must count once: outdeg(a) == 1
    assert one["b"] == 150000 + (85 * 1_000_000) // 100


def _weight(tok: str) -> int:
    return int(hashlib.md5(f"w|{tok}".encode()).hexdigest()[:4], 16) % 2001


def test_hashed_quality_score_matches_python(spark):
    df = spark.createDataFrame(
        [(0, "spark join scan"), (1, ""), (2, "Spark SPARK spark")],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            token_count("text").alias("n"),
            hashed_quality_score("text").alias("s"),
        ).collect()
    }
    w = [_weight(t) for t in ("spark", "join", "scan")]
    assert rows[0].s == (sum(w) * 1000) // 3
    assert rows[1].s is None and rows[1].n == 0
    # case-folded: three identical tokens -> mean == single weight * 1000
    assert rows[2].s == _weight("spark") * 1000


def test_canonical_url_edge_cases(spark):
    from surfactant_spark.functions.textfx import canonical_url

    cases = [
        # (raw, expected)
        ("HtTpS://WWW.Ex.COM:443/a//b/index.html?b=2&a=1&#frag",
         "https://www.ex.com/a/b/?a=1&b=2"),
        ("http://Host.COM:80", "http://host.com/"),
        ("http://host.com:8080/x/index.htm", "http://host.com:8080/x/"),
        ("https://h/p?", "https://h/p"),
        ("http://h/a///b?z=1&a=2", "http://h/a/b?a=2&z=1"),
        # index.html only stripped as a path segment, not mid-name
        ("http://h/myindex.html", "http://h/myindex.html"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], ["url"])
    got = [r.c for r in df.select(canonical_url("url").alias("c")).collect()]
    assert got == [e for _, e in cases]


def test_gopher_features_hand_computed(spark):
    from surfactant_spark.functions.textfx import gopher_features, gopher_keep

    txt = "The cat ... sat #on the mat with gusto today"
    df = spark.createDataFrame([(0, txt), (1, "")], ["doc_id", "text"])
    f = gopher_features("text")
    r = {
        x.doc_id: x
        for x in df.select(
            "doc_id", *(f[k].alias(k) for k in f),
            gopher_keep("text", min_words=5, min_stop_hits=2).alias("keep"),
        ).collect()
    }
    # 10 words; lengths 3+3+3+3+3+3+3+4+5+5 = 35 -> mean 3500
    assert r[0].n_words == 10
    assert r[0].mean_word_len_x1000 == (35 * 1000) // 10
    # one '#' + one '...' over 10 words -> 200
    assert r[0].symbol_ratio_x1000 == (2 * 1000) // 10
    # '...' is not alphabetic -> 9/10 alpha words
    assert r[0].alpha_ratio_x1000 == (9 * 1000) // 10
    # 'the' (x2 distinct once) + 'with' = 2 hits
    assert r[0].stop_hits == 2
    assert r[0].keep is False  # symbol ratio 200 > 100
    assert r[1].n_words == 0 and r[1].mean_word_len_x1000 is None


def test_bm25_topk_hand_computed(spark):
    from surfactant_spark.operators.indexing import bm25_topk

    df = spark.createDataFrame(
        [(0, "apple apple banana"), (1, "banana cherry")], ["doc_id", "text"]
    )
    rows = bm25_topk(df, k=2).collect()
    got = {(r.doc_id, r.term): (r.score_u, r.rn) for r in rows}
    N, T = 2, 5
    def score(tf, df_, dl):
        idf = ((2 * (N - df_) + 1) * 1_000_000) // (2 * df_ + 1)
        norm = 250 + (750 * dl * N) // T
        return (idf * tf * 2200) // (tf * 1000 + (120 * norm) // 100)
    assert got[(0, "apple")] == (score(2, 1, 3), 1)
    assert got[(0, "banana")] == (score(1, 2, 3), 2)
    assert got[(1, "cherry")] == (score(1, 1, 2), 1)
    assert got[(1, "banana")] == (score(1, 2, 2), 2)


def test_hits_int_hand_computed(spark):
    from surfactant_spark.operators.graphquery import hits_int

    e = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["src", "dst"]
    )
    got = {r.node: (r.hub_u, r.auth_u) for r in hits_int(e, iterations=2).collect()}
    # iter1: auth b=500000 c=1000000; hub a=1000000 b=666666 c=0
    # iter2: a_raw b=1000000 c=1666666 -> auth b=600000 c=1000000
    #        h_raw a=1600000 b=1000000 -> hub a=1000000 b=625000
    assert got == {
        "a": (1_000_000, 0),
        "b": (625_000, 600_000),
        "c": (0, 1_000_000),
    }


def test_label_propagation_square_and_determinism(spark):
    from surfactant_spark.operators.graphquery import label_propagation

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"]
    )
    one = {r.node: r.label for r in label_propagation(e, rounds=2).collect()}
    # bipartite square: round1 every node takes min neighbor label,
    # round2 swaps back deterministically
    assert one == {1: 1, 2: 2, 3: 1, 4: 2}
    two = {
        r.node: r.label
        for r in label_propagation(e.repartition(5), rounds=2).collect()
    }
    assert one == two


def test_script_counts_hand_computed(spark):
    from surfactant_spark.functions.textfx import dominant_script, script_counts

    df = spark.createDataFrame(
        [(0, "abc 你好 пр م"), (1, "你好世界 ok"), (2, "123 !?")],
        ["doc_id", "text"],
    )
    sc = script_counts("text")
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *[sc[k] for k in ("latin", "cjk", "cyrillic", "arabic")],
            dominant_script("text").alias("s"),
        ).collect()
    }
    assert (rows[0].n_latin, rows[0].n_cjk, rows[0].n_cyrillic,
            rows[0].n_arabic) == (3, 2, 2, 1)
    assert rows[0].s == "latin"        # ties broken by priority
    assert rows[1].s == "cjk"          # 4 cjk > 2 latin
    assert rows[2].s == "none"
