"""DSIR importance weighting (operators/dsir.py).

Ground truth is a pure-Python replica of the hashed unigram+bigram
model — tokenize, md5-bucket, count, smoothed log-ratios, score — run
on small hand-built corpora; the Spark side must match integer-exactly.
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from surfactant_spark.operators import dsir

B = 64


def py_tokens(text: str) -> list[str]:
    return re.findall(r"[a-z0-9]+", text.lower())


def py_grams(text: str) -> list[str]:
    t = py_tokens(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def py_bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % B


def py_counts(texts: list[str]) -> dict[int, int]:
    out: dict[int, int] = {}
    for tx in texts:
        for g in py_grams(tx):
            b = py_bucket(g)
            out[b] = out.get(b, 0) + 1
    return out


def py_score(text: str, lr: list[int]) -> int:
    return sum(lr[py_bucket(g)] for g in py_grams(text))


TARGET = [
    "quantum flux decoherence entangles qubit lattices",
    "decoherence of the qubit flux lattice is quantum",
]
RAW = TARGET + [
    "cheap pills buy now click here free offer",
    "click here now for free cheap offer pills",
    "the cat sat on the mat and purred",
]


def test_log_ratios_arithmetic():
    lr = dsir.log_ratios({0: 9}, {0: 4}, n_buckets=2, scale=1_000_000)
    # p_t(0) = 10/11, p_r(0) = 5/6; p_t(1) = 1/11, p_r(1) = 1/6
    assert lr[0] == round(1e6 * (math.log(10 / 11) - math.log(5 / 6)))
    assert lr[1] == round(1e6 * (math.log(1 / 11) - math.log(1 / 6)))


def test_bucket_counts_matches_python(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(RAW)], "doc_id long, text string")
    got = {
        r.bucket: r.cnt
        for r in dsir.bucket_counts(df, n_buckets=B).collect()
    }
    assert got == py_counts(RAW)


def test_importance_score_integer_exact(spark):
    lr = dsir.log_ratios(py_counts(TARGET), py_counts(RAW), n_buckets=B)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(RAW)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.score_u
        for r in df.select(
            "doc_id", dsir.importance_score("text", lr, B).alias("score_u")
        ).collect()
    }
    for i, tx in enumerate(RAW):
        assert got[i] == py_score(tx, lr), i


def test_dsir_select_prefers_target_like_docs(spark):
    lr = dsir.log_ratios(py_counts(TARGET), py_counts(RAW), n_buckets=B)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(RAW)], "doc_id long, text string"
    )
    top = dsir.dsir_select(df, lr, k=2, n_buckets=B).collect()
    assert {r.doc_id for r in top} == {0, 1}  # the two target docs win
    # scores sorted desc, tie-break by id
    assert [r.score_u for r in top] == sorted(
        (r.score_u for r in top), reverse=True
    )


def test_empty_and_degenerate_text(spark):
    lr = [7] * B
    df = spark.createDataFrame(
        [(0, ""), (1, "???!!!"), (2, "one")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.score_u
        for r in df.select(
            "doc_id", dsir.importance_score("text", lr, B).alias("score_u")
        ).collect()
    }
    assert got[0] == 0 and got[1] == 0  # no tokens → zero score
    assert got[2] == 7  # one unigram, no bigram


@pytest.mark.parametrize("gram", ["hello", "hello world", "42"])
def test_bucket_parity_spark_duckdb(spark, gram):
    import duckdb

    (row,) = spark.sql(
        f"SELECT {dsir._bucket_sql(repr(gram), B)} AS b"
    ).collect()
    (drow,) = duckdb.sql(
        f"SELECT ('0x' || substr(md5('{gram}'), 1, 4))::BIGINT % {B} AS b"
    ).fetchall()
    assert row.b == drow[0] == py_bucket(gram)
