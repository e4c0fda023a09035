"""End-to-end test of the training-corpus builder: dedup → quality →
PII scrub → packing → JSONL + manifest, with per-stage counts."""

import glob

from surfactant_spark.plans.training import build_training_corpus


def _good_doc(i: int) -> str:
    # >50 words, healthy stopword density, clean symbols; the body is
    # seeded per doc so documents are NOT near-duplicates of each other
    words = []
    for j in range(70):
        words.append(f"w{(i * 31 + j * 7) % 997}x{(i + j) % 53}")
        if j % 5 == 0:
            words.append("the")
        if j % 7 == 0:
            words.append("and")
    return " ".join(words)


def test_build_training_corpus_counts_and_outputs(spark, tmp_path):
    rows = [(i, _good_doc(i), "en") for i in range(8)]
    # a near-duplicate of doc 0 (loses keep-best: same length minus one)
    rows.append((100, _good_doc(0)[:-2], "en"))
    # a short junk doc that fails the Gopher word-count rule
    rows.append((101, "too short", "en"))
    # a doc with an email that must be scrubbed
    rows.append((102, _good_doc(55) + " contact bob@example.com now", "en"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])

    out = str(tmp_path / "corpus")
    res = build_training_corpus(docs, out_dir=out, block=64, min_words=50)

    assert res.counts["input"] == 11
    assert res.counts["after_dedup"] == 10          # near-dup dropped
    assert res.counts["after_quality"] == 9         # junk dropped
    assert res.counts["n_sequences"] >= 9           # ~100 words/doc, block 64

    kept_ids = {r.doc_id for r in res.docs.select("doc_id").collect()}
    assert 100 not in kept_ids and 101 not in kept_ids
    assert 102 in kept_ids

    scrubbed = res.docs.where("doc_id = 102").collect()[0].text
    assert "bob@example.com" not in scrubbed

    # packing columns are contiguous: offsets strictly increase by
    # n_tokens in doc_id order
    plan = sorted(
        res.docs.select("doc_id", "n_tokens", "tok_offset").collect(),
        key=lambda r: r.doc_id,
    )
    off = 0
    for r in plan:
        assert r.tok_offset == off
        off += r.n_tokens

    # outputs on disk: gzipped jsonl shards + parquet manifest
    assert glob.glob(out + "/docs/*.json.gz")
    manifest = spark.read.parquet(out + "/sequences")
    assert manifest.count() == res.counts["n_sequences"]
    # total packed tokens == total doc tokens
    total_doc = sum(r.n_tokens for r in plan)
    total_seq = sum(r.seq_len for r in manifest.collect())
    assert total_doc == total_seq


def test_build_training_corpus_no_outdir(spark):
    docs = spark.createDataFrame(
        [(1, _good_doc(1), "en"), (2, "tiny", "en")],
        ["doc_id", "text", "lang"],
    )
    res = build_training_corpus(docs, out_dir=None, block=32)
    assert res.counts["after_quality"] == 1
    assert res.sequences.count() == res.counts["n_sequences"]
