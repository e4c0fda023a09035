"""Content-defined chunking (dedup.cdc_chunks): python-replica parity
and the CDC locality property (an edit only re-chunks its
neighborhood, so shifted near-duplicates share most chunk hashes)."""

from __future__ import annotations

import hashlib
import re

from surfactant_spark.operators.dedup import cdc_chunks


def py_cdc(text, k=3, D=16):
    t = re.findall(r"[a-z0-9]+", text.lower())
    if not t:
        return []
    h = [
        int(hashlib.md5(" ".join(t[i:i + k]).encode()).hexdigest()[:8], 16)
        for i in range(max(len(t) - k + 1, 0))
    ]
    starts = [0] + [i + 1 for i, x in enumerate(h) if x % D == 0]
    out = []
    for j, s in enumerate(starts):
        e = starts[j + 1] if j + 1 < len(starts) else len(t)
        ch = t[s:e]
        out.append((j + 1, len(ch), hashlib.md5(" ".join(ch).encode()).hexdigest()))
    return out


def test_cdc_matches_python_replica(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    got: dict[int, list] = {}
    for r in cdc_chunks(docs).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_idx, r.n_toks, r.chunk_hash))
    for r in docs.select("doc_id", "text").collect():
        assert sorted(got.get(r.doc_id, [])) == sorted(py_cdc(r.text)), r.doc_id


def test_cdc_edge_cases(spark):
    df = spark.createDataFrame(
        [(0, ""), (1, "one two"), (2, "???")],
        "doc_id long, text string",
    )
    rows = cdc_chunks(df).collect()
    # token-less docs emit nothing; <k tokens = one whole-doc chunk
    by_doc = {r.doc_id: r for r in rows}
    assert set(by_doc) == {1}
    assert by_doc[1].n_toks == 2 and by_doc[1].chunk_idx == 1


def test_cdc_locality_shifted_neardup_shares_chunks(spark):
    """Prepending a token to a long doc must leave the chunk-hash set
    largely intact (fixed-size blocks would all shift and change)."""
    base = " ".join(f"tok{i * 37 % 211}" for i in range(400))
    edited = "inserted " + base
    df = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id long, text string"
    )
    chunks: dict[int, set] = {0: set(), 1: set()}
    for r in cdc_chunks(df).collect():
        chunks[r.doc_id].add(r.chunk_hash)
    shared = chunks[0] & chunks[1]
    # every chunk after the first boundary is identical content →
    # the overwhelming majority of the base doc's chunks survive
    assert len(shared) >= len(chunks[0]) - 2
    assert len(chunks[0]) >= 10  # the fixture is long enough to matter


def test_cdc_cross_doc_dedup_groupby(spark):
    """The dedup consumer shape: one partial-agg groupBy on chunk_hash
    finds the shared chunks."""
    import pyspark.sql.functions as F

    base = " ".join(f"w{i % 97}x{i % 53}" for i in range(300))
    df = spark.createDataFrame(
        [(0, base), (1, "prefix " + base)], "doc_id long, text string"
    )
    stats = (
        cdc_chunks(df)
        .groupBy("chunk_hash")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_toks").alias("toks"))
        .where(F.col("n") > 1)
    )
    assert stats.count() > 0
