"""Hard-negative mining (similarity.hard_negatives)."""

from __future__ import annotations

import pyspark.sql.functions as F

from surfactant_spark.operators.similarity import (
    brute_force_topk,
    hard_negatives,
)

SF = "/root/testdata/sf0.001"


def test_hard_negatives_below_threshold_and_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = hard_negatives(emb, max_cos_x10000=9000).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.cos_x10000 < 9000
        assert r.anchor_id != r.negative_id
    # one row per anchor
    anchors = [r.anchor_id for r in rows]
    assert len(anchors) == len(set(anchors))
    # replayable
    again = {
        (r.anchor_id, r.negative_id, r.cos_x10000)
        for r in hard_negatives(emb, max_cos_x10000=9000).collect()
    }
    assert again == {
        (r.anchor_id, r.negative_id, r.cos_x10000) for r in rows
    }


def test_hard_negative_is_hardest_among_candidates(spark):
    """For anchors where the mined negative appears in the exact global
    top-k, nothing MORE similar (but still sub-threshold) in that
    anchor's bucket candidates can be a better negative: the mined cos
    must be <= the best sub-threshold exact neighbor's cos, and equal
    whenever the global best sub-threshold neighbor collided in LSH."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 20)
    mined = {
        r.anchor_id: r.cos_x10000
        for r in hard_negatives(emb, max_cos_x10000=9000).collect()
        if r.anchor_id < 20
    }
    exact = {}
    for r in brute_force_topk(q, emb, k=50).collect():
        if r.cos_x10000 < 9000:
            exact.setdefault(r.query_id, r.cos_x10000)  # first = max
    for anchor, cos in mined.items():
        if anchor in exact:
            assert cos <= exact[anchor], (anchor, cos, exact[anchor])
