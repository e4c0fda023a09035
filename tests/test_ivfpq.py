"""IVF-PQ (similarity.ivfpq_topk): on data with real neighbor
structure the product-quantized rerank recovers the true neighbors
(the driver gate proves engine parity; random vectors can't show
recall — concentration of measure makes all candidates near-ties)."""

from __future__ import annotations

import hashlib
import struct

import pyspark.sql.functions as F

from surfactant_spark.operators.similarity import (
    _kmeans,
    ivfpq_topk,
    train_pq_codebooks,
)

DIM = 64
FAMILIES = 10
COPIES = 4


def _unit(seed: str) -> list[float]:
    vals = []
    i = 0
    while len(vals) < DIM:
        h = hashlib.md5(f"{seed}|{i}".encode()).digest()
        vals.extend(struct.unpack("16b", h))
        i += 1
    return [v / 127.0 for v in vals[:DIM]]


def _vectors():
    vecs = []
    for fam in range(FAMILIES):
        base = [x * 10.0 for x in _unit(f"fam{fam}")]
        for c in range(COPIES):
            noise = _unit(f"n{fam}.{c}")
            vecs.append(
                (fam * 10 + c, [b + 0.05 * n for b, n in zip(base, noise)])
            )
    return vecs


def test_ivfpq_recovers_planted_neighbors(spark):
    vecs = _vectors()
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    train = [v for _, v in vecs]
    coarse = _kmeans(train, 8, 5)
    cbs = train_pq_codebooks(train, n_sub=8, k=16, iters=5)
    q = df.where(F.col("vec_id") % 10 == 0)  # one query per family
    got = {}
    for r in ivfpq_topk(q, df, coarse, cbs, k=3, nprobe=2).collect():
        got.setdefault(r.query_id, set()).add(r.target_id)
    assert len(got) == FAMILIES
    for fam in range(FAMILIES):
        siblings = {fam * 10 + c for c in range(1, COPIES)}
        found = got[fam * 10]
        # PQ codes of tiny-noise copies land on the same centroids →
        # all three siblings outrank every other family
        assert len(found & siblings) == 3, (fam, found)


def test_pq_codebook_structure():
    vecs = [v for _, v in _vectors()]
    cbs = train_pq_codebooks(vecs, n_sub=8, k=16, iters=5)
    assert len(cbs) == 8
    for cb in cbs:
        assert 1 <= len(cb) <= 16
        assert all(len(c) == 8 for c in cb)
    # deterministic retrain
    assert cbs == train_pq_codebooks(vecs, n_sub=8, k=16, iters=5)
