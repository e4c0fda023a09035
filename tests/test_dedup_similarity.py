"""Semantic checks for the dedup & similarity families: LSH must catch
true near-duplicates, SimHash near-pairs must respect hamming bounds,
and LSH-ANN recall is measured against the exact brute force."""

import pytest
from pyspark.sql import functions as F

from surfactant_spark.operators.dedup import (
    exact_dup_groups,
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    simhash32,
    simhash_near_pairs,
)
from surfactant_spark.operators.similarity import brute_force_topk, lsh_topk


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the mouse runs through the old wooden house"
)


@pytest.fixture()
def near_dup_docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("lazy", "sleepy")),  # near dup
        (3, "completely different text about spark query engines and "
            "distributed joins across many executor nodes in a cluster"),
        (4, "another unrelated document mentioning databases indexes "
            "transactions logs checkpoints and recovery procedures"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dup_groups(spark, near_dup_docs):
    rows = exact_dup_groups(near_dup_docs).collect()
    assert len(rows) == 1 and rows[0].doc_ids == "0|1"


def test_lsh_catches_near_dups_not_unrelated(spark, near_dup_docs):
    pairs = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(near_dup_docs).collect()}
    assert (0, 1) in pairs          # exact dup always collides
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup shares bands
    assert (3, 4) not in pairs      # unrelated docs don't collide


def test_simhash_hamming_properties(spark, near_dup_docs):
    sh = {r.doc_id: r.simhash32 for r in simhash32(near_dup_docs).collect()}
    assert sh[0] == sh[1]  # identical text → identical fingerprint
    ham_near = bin(sh[0] ^ sh[2]).count("1")
    ham_far = bin(sh[0] ^ sh[3]).count("1")
    assert ham_near < ham_far
    pairs = {(r.id_a, r.id_b) for r in simhash_near_pairs(near_dup_docs, max_hamming=3).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def test_ngram_jaccard_ordering(spark, near_dup_docs):
    rows = {(r.id_a, r.id_b): r.jaccard_x1000
            for r in ngram_jaccard_pairs(near_dup_docs, min_jaccard_x1000=1).collect()}
    assert rows[(0, 1)] == 1000  # identical
    assert rows[(0, 2)] > rows.get((0, 3), 0)


def test_lsh_ann_recall_vs_brute_force(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    exact = brute_force_topk(queries, emb, k=5)
    approx = lsh_topk(queries, emb, k=5, dim=64, bits=3, tables=8)
    e = {(r.query_id, r.target_id) for r in exact.collect()}
    a = {(r.query_id, r.target_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # LSH trades recall for sub-quadratic scaling; demand a sane floor
    assert recall >= 0.4, f"recall {recall}"
    # approx scores where present must agree with exact computation
    ex = {(r.query_id, r.target_id): r.cos_x10000 for r in exact.collect()}
    for r in approx.collect():
        if (r.query_id, r.target_id) in ex:
            assert ex[(r.query_id, r.target_id)] == r.cos_x10000
