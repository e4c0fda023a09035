"""Semantic checks for corpus-level passage dedup (C4-style) and the
Gopher repetition signals — hand-computable fixtures."""

import hashlib

from pyspark.sql import functions as F

from surfactant_spark.functions.textfx import ngram_strings, passage_strings
from surfactant_spark.operators.dedup import passage_dedup


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_passage_strings_chunks(spark):
    df = spark.createDataFrame([("a b c d e f g",)], ["text"])
    [row] = df.select(passage_strings("text", chunk=3).alias("p")).collect()
    assert row.p == ["a b c", "d e f", "g"]
    [row] = (
        spark.createDataFrame([("",)], ["text"])
        .select(passage_strings("text", chunk=3).alias("p"))
        .collect()
    )
    assert row.p == []


def test_passage_dedup_first_occurrence_wins(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f"),   # both passages first occurrences
            (1, "a b c x y z"),   # "a b c" owned by doc 0; "x y z" kept
            (2, "d e f"),         # fully duplicated by doc 0
            (3, ""),              # zero tokens
        ],
        ["doc_id", "text"],
    )
    rows = {
        r.doc_id: r
        for r in passage_dedup(docs, chunk=3).collect()
    }
    assert (rows[0].n_passages, rows[0].n_kept, rows[0].kept_frac_x1000) == (2, 2, 1000)
    assert rows[0].kept_fp == _md5("a b c d e f")
    assert (rows[1].n_passages, rows[1].n_kept, rows[1].kept_frac_x1000) == (2, 1, 500)
    assert rows[1].kept_fp == _md5("x y z")
    assert (rows[2].n_passages, rows[2].n_kept, rows[2].kept_frac_x1000) == (1, 0, 0)
    assert rows[2].kept_fp is None
    assert (rows[3].n_passages, rows[3].n_kept) == (0, 0)
    assert rows[3].kept_frac_x1000 is None and rows[3].kept_fp is None


def test_ngram_strings(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], ["text"])
    got = [r.g for r in df.select(ngram_strings("text", 3).alias("g")).collect()]
    assert got == [["a b c", "b c d"], []]


def test_gopher_repetition_signals(spark):
    docs = spark.createDataFrame(
        [(0, "a a a a a"), (1, "a b c d"), (2, "a b")],
        ["doc_id", "text"],
    )
    g = docs.select("doc_id", F.explode(ngram_strings("text", 3)).alias("g"))
    per = g.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    agg = {
        r.doc_id: r
        for r in per.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n"),
            F.count(F.lit(1)).alias("d"),
            F.max("c").alias("top"),
        )
        .collect()
    }
    # doc 0: "a a a" ×3 → 3 grams, 1 distinct, top 3
    assert (agg[0].n, agg[0].d, agg[0].top) == (3, 1, 3)
    # doc 1: two distinct grams
    assert (agg[1].n, agg[1].d, agg[1].top) == (2, 2, 1)
    # doc 2: too short → no grams at all
    assert 2 not in agg


def test_passage_dedup_string_ids(spark):
    """First-occurrence resolution uses a (doc_id, p_idx) struct min, not
    an arithmetic cast — non-numeric string ids must work (the r5 cast
    NULLed them: every doc reported n_kept=0) with lexicographic order."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    docs = spark.createDataFrame(
        [("url-b", base), ("url-a", base), ("url-c", base + " kilo")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in passage_dedup(docs, chunk=10).collect()}
    # 'url-a' is the lexicographic first holder of the shared passage
    assert out["url-a"].n_kept == 1
    assert out["url-b"].n_kept == 0
    assert out["url-b"].kept_fp is None
    # url-c keeps only its residual 1-token passage
    assert (out["url-c"].n_passages, out["url-c"].n_kept) == (2, 1)
    assert out["url-c"].kept_fp == hashlib.md5(b"kilo").hexdigest()
