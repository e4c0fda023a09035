"""Hand-computed fixtures for the capped inverted index and the
domain-mixture reweighting."""

from pyspark.sql import functions as F

from surfactant_spark.operators.indexing import build_inverted_index
from surfactant_spark.operators.sampling import mixture_weights


def test_inverted_index_cap_and_df(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple banana banana banana"),
            (3, "apple cherry"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.term: (r.df, r.postings)
        for r in build_inverted_index(docs, k=2).collect()
    }
    # df is UNCAPPED (apple appears in 3 docs) while postings keep the
    # top-2 by tf, ties broken by ascending doc id
    assert got["apple"] == (3, "1:2|2:1")
    assert got["banana"] == (2, "2:3|1:1")
    assert got["cherry"] == (1, "3:1")


def test_inverted_index_partition_invariant(spark):
    docs = spark.range(120).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("w"), (F.col("id") % 9).cast("string"),
            F.lit(" w"), (F.col("id") % 9).cast("string"),
            F.lit(" w"), (F.col("id") % 4).cast("string"),
        ).alias("text"),
    )
    one = sorted(map(tuple, build_inverted_index(docs, k=3).collect()))
    two = sorted(
        map(tuple, build_inverted_index(docs.repartition(13), k=3).collect())
    )
    assert one == two and len(one) > 0


def test_mixture_weights_hand_computed(spark):
    # en: 6 tokens, de: 2 tokens, zh: 2 tokens -> total 10
    docs = spark.createDataFrame(
        [
            (1, "en", "a b c d"),
            (2, "en", "e f"),
            (3, "de", "g h"),
            (4, "zh", "i j"),
        ],
        ["doc_id", "lang", "text"],
    )
    target = {"en": 500_000, "de": 500_000}  # zh absent -> dropped
    got = {
        r.grp: (r.n_docs, r.n_tokens, r.weight_ppm)
        for r in mixture_weights(docs, "lang", target).collect()
    }
    # weight = target_ppm * total / group_tokens
    assert got["en"] == (2, 6, 500_000 * 10 // 6)
    assert got["de"] == (1, 2, 500_000 * 10 // 2)
    assert got["zh"] == (1, 2, 0)


def test_mixture_weights_natural_rate_identity(spark):
    # a target equal to the current distribution gives weight 1e6
    docs = spark.createDataFrame(
        [(1, "a", "x y"), (2, "b", "p q")], ["doc_id", "lang", "text"]
    )
    got = {
        r.grp: r.weight_ppm
        for r in mixture_weights(
            docs, "lang", {"a": 500_000, "b": 500_000}
        ).collect()
    }
    assert got == {"a": 1_000_000, "b": 1_000_000}


def test_cooccurrence_pairs_cap_and_counts(spark):
    from surfactant_spark.operators.indexing import cooccurrence_pairs

    df = spark.createDataFrame(
        [
            (0, "b a c a"),          # distinct sorted: a b c
            (1, "c b d"),            # b c d
            (2, "z y"),              # singleton pair
        ],
        ["doc_id", "text"],
    )
    got = {
        (r.term_a, r.term_b): r.n_docs
        for r in cooccurrence_pairs(df, min_count=2, max_terms=64).collect()
    }
    assert got == {("b", "c"): 2}
    # cap: with max_terms=2 doc0 keeps {a,b}, doc1 {b,c} -> no shared pair
    assert (
        cooccurrence_pairs(df, min_count=2, max_terms=2).count() == 0
    )


def test_anchor_text_profile_collapses_spellings(spark):
    from surfactant_spark.operators.linking import anchor_text_profile

    links = spark.createDataFrame(
        [
            ("HTTP://A.com:80/x//index.html?b=1&a=2", "click", "s1"),
            ("http://a.COM/x/?a=2&b=1", "here", "s2"),
            ("http://a.com/other", "click", "s1"),
        ],
        ["href", "anchor", "src_host"],
    )
    got = {r.canon: r for r in anchor_text_profile(links).collect()}
    assert set(got) == {"http://a.com/x/?a=2&b=1", "http://a.com/other"}
    prof = got["http://a.com/x/?a=2&b=1"]
    assert prof.n_links == 2 and prof.n_anchors == 2
    assert prof.anchors == "click|here" and prof.n_src_hosts == 2
