"""Unit tests for BPE apply (hand-computed encodings), triple
verbalization / QA generation, and the training JSONL sink."""

from pyspark.sql import functions as F

from surfactant_spark.operators.bpe import (
    bpe_token_counts,
    bpe_word,
    encode_distinct_words,
)
from surfactant_spark.operators.verbalize import (
    kg_qa_pairs,
    verbalize_triples,
)


MERGES = [("a", "t"), ("t", "h"), ("th", "e"), ("d", "a"), ("da", "t"),
          ("dat", "a")]
RANKS = {p: i for i, p in enumerate(MERGES)}


def test_bpe_word_priority_order():
    # "data": d-a-t-a -> rank0 (a,t) merges FIRST (lowest rank), giving
    # d-at-a, which blocks (d,a)/(da,t): no further merges apply
    assert bpe_word("data", RANKS) == ["d", "at", "a"]
    # "the": t-h (rank1) -> th; th-e (rank2) -> the
    assert bpe_word("the", RANKS) == ["the"]
    # "at" everywhere, all occurrences merged in one sweep
    assert bpe_word("atat", RANKS) == ["at", "at"]


def test_bpe_word_no_applicable_merges():
    assert bpe_word("xyz", RANKS) == ["x", "y", "z"]
    assert bpe_word("a", RANKS) == ["a"]
    assert bpe_word("", RANKS) == []


def test_bpe_merge_order_matters():
    # with (d,a) ranked FIRST, "data" becomes da-t-a -> dat-a -> data
    merges2 = [("d", "a"), ("da", "t"), ("dat", "a"), ("a", "t")]
    assert bpe_word("data", {p: i for i, p in enumerate(merges2)}) == ["data"]


def test_encode_distinct_words_stage(spark):
    df = spark.createDataFrame([("data",), ("the",), ("data",)], ["word"])
    got = {r.word: (list(r.pieces), r.n_pieces)
           for r in encode_distinct_words(df, MERGES).collect()}
    assert got == {
        "data": (["d", "at", "a"], 3),
        "the": (["the"], 1),
    }


def test_bpe_token_counts_per_doc(spark):
    docs = spark.createDataFrame(
        [(1, "the data"), (2, "xyz"), (3, "")], ["doc_id", "text"]
    )
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens)
           for r in bpe_token_counts(docs, MERGES).collect()}
    assert got == {1: (2, 4), 2: (1, 3), 3: (0, 0)}


def test_verbalize_templates_and_fallback(spark):
    e = spark.createDataFrame(
        [("a", "Uses", "b"), ("a", "Weird", "c")], ["subj", "pred", "obj"]
    )
    got = {(r.subj, r.pred): r.sentence
           for r in verbalize_triples(e).collect()}
    assert got[("a", "Uses")] == "a uses b."
    assert got[("a", "Weird")] == "a Weird c."


def test_verbalize_custom_template_slots(spark):
    e = spark.createDataFrame([("x", "P", "y")], ["subj", "pred", "obj"])
    got = verbalize_triples(
        e, {"P": "{o} is required by {s}!"}
    ).collect()[0]
    assert got.sentence == "y is required by x!"


def test_kg_qa_multi_answer_sorted(spark):
    e = spark.createDataFrame(
        [("a", "Uses", "z"), ("a", "Uses", "b"), ("a", "Uses", "b"),
         ("a", "Weird", "q")],
        ["subj", "pred", "obj"],
    )
    rows = kg_qa_pairs(e).collect()
    assert len(rows) == 1  # Weird excluded
    r = rows[0]
    assert r.question == "What does a use?"
    assert r.answer == "b, z"
    assert r.n_objects == 2


def test_write_training_jsonl_roundtrip(spark, tmp_path):
    from surfactant_spark.sources.sinks import write_training_jsonl

    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], ["doc_id", "text"]
    )
    out = str(tmp_path / "corpus")
    write_training_jsonl(df, out)
    back = spark.read.json(out)
    got = {(r.doc_id, r.text) for r in back.collect()}
    assert got == {(1, "alpha"), (2, "beta")}
    import glob
    assert glob.glob(out + "/*.json.gz"), "expected gzipped shards"


def test_learn_merges_hand_computed(spark):
    """BPE training argmax + tie-break, hand-computed: corpus
    'the the cat' / 'the cat sat' → pair counts (a,t)=3 (t,h)=3 (h,e)=3
    (c,a)=2 (s,a)=1; ties resolve (x,y)-lexicographic, later rounds
    merge against re-encoded words."""
    from surfactant_spark.operators.bpe import learn_merges

    docs = spark.createDataFrame(
        [(1, "the the cat"), (2, "the cat sat")], ["doc_id", "text"]
    )
    got = learn_merges(docs, n_merges=6)
    assert got == [
        ("a", "t", 3),
        ("h", "e", 3),
        ("t", "he", 3),
        ("c", "at", 2),
        ("s", "at", 1),
    ]
