"""Multi-probe LSH (similarity.multiprobe_topk / _probes_expr)."""

from __future__ import annotations

import pyspark.sql.functions as F

from surfactant_spark.operators.similarity import (
    _probes_expr,
    brute_force_topk,
    multiprobe_topk,
    table_planes,
)

SF = "/root/testdata/sf0.001"


def test_probe_structure(spark):
    """1 + nprobe probes; probe 0 is the base bucket; the others are
    single-bit flips of it."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(20)
    planes = table_planes(64, 6, 1)[0]
    rows = emb.select(
        _probes_expr("embedding", planes, 2).alias("p")
    ).collect()
    for r in rows:
        assert len(r.p) == 3
        base = r.p[0]
        assert 0 <= base < 64
        for flip in r.p[1:]:
            x = base ^ flip
            assert x != 0 and (x & (x - 1)) == 0  # exactly one bit differs
        assert len(set(r.p)) == 3  # distinct probes


def test_multiprobe_recall_at_least_single_probe(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 8)
    truth = {
        (r.query_id, r.target_id)
        for r in brute_force_topk(q, emb, k=5).collect()
    }
    kw = dict(k=5, dim=64, bits=6, tables=1)

    def recall(nprobe):
        got = {
            (r.query_id, r.target_id)
            for r in multiprobe_topk(q, emb, nprobe=nprobe, **kw).collect()
        }
        return len(got & truth)

    r0, r2 = recall(0), recall(2)
    assert r2 >= r0  # probing flip buckets can only add candidates
    assert r2 > 0


def test_multiprobe_candidates_superset_of_single(spark):
    """nprobe=0 candidate pairs ⊆ nprobe=2 candidate pairs (the probe
    sequence always starts with the base bucket)."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 4)
    kw = dict(k=100, dim=64, bits=6, tables=1)
    single = {
        (r.query_id, r.target_id)
        for r in multiprobe_topk(q, emb, nprobe=0, **kw).collect()
    }
    multi = {
        (r.query_id, r.target_id)
        for r in multiprobe_topk(q, emb, nprobe=2, **kw).collect()
    }
    assert single <= multi
