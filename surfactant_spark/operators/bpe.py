"""Byte-pair-encoding application with a FIXED merge table — the real
tokenizer-apply step of an LLM data pipeline (token budgeting, length
filtering, cost estimation), as opposed to textfx.token_count's
whitespace proxy.  Training the merge table is out of scope (that is
a one-off driver-side job over a frequency table); applying it to a
corpus is the 100-TB operation.

Scale shape: BPE is a per-WORD pure function, so the corpus explodes
to tokens, reduces to DISTINCT words (the zipfian trick every
operator here uses — vocabulary ≪ corpus), each distinct word is
encoded ONCE in an Arrow-batched stage with the merge ranks shipped
by broadcast, and per-document counts come from one equi-join back on
the word plus one partial-agg groupBy.  A 10^12-token corpus with a
10^6-word vocabulary pays 10^6 Python-side encodes, not 10^12.

The gate's DuckDB oracle unrolls the merge loop: for a rank-ordered
table (every rule's output appears only in higher-rank rules — true of
any trained BPE table), the best-rank loop equals sequential rank-order
merge-all passes, and each pass is one string ``replace`` over a
delimiter-wrapped symbol sequence (queries._bpe_sql, asserted +
hash-checked at two scale factors); unit tests additionally pin
hand-computed encodings (tests/test_bpe_verbalize.py).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bpe_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word: start from characters, repeatedly merge ALL
    occurrences of the lowest-rank adjacent pair (left-to-right scan),
    until no mergeable pair remains — the GPT-2 apply loop."""
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
        if best_rank is None:
            break
        pair = None
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and ranks.get((syms[i], syms[i + 1])) == best_rank
            ):
                out.append(syms[i] + syms[i + 1])
                pair = True
                i += 2
            else:
                out.append(syms[i])
                i += 1
        assert pair
        syms = out
    return syms


def encode_distinct_words(
    words: DataFrame, merges: list[tuple[str, str]], word_col: str = "word"
) -> DataFrame:
    """(word) → (word, pieces array<string>, n_pieces) for DISTINCT
    words; merge ranks ride a broadcast variable into one Arrow
    stage."""
    spark = words.sparkSession
    ranks = {pair: i for i, pair in enumerate(merges)}
    b = spark.sparkContext.broadcast(ranks)

    def stage(batches) -> Iterator:
        import pandas as pd

        r = b.value
        for pdf in batches:
            enc = [bpe_word(w, r) for w in pdf[word_col]]
            yield pd.DataFrame(
                {
                    "word": pdf[word_col],
                    "pieces": enc,
                    "n_pieces": [len(e) for e in enc],
                }
            )

    return words.select(word_col).distinct().mapInPandas(
        stage, schema="word string, pieces array<string>, n_pieces long"
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token budget: (id, n_words, n_bpe_tokens).
    Explode → distinct-word encode (broadcast ranks) → join back →
    one partial-agg groupBy.  Zero-token documents keep a row with
    zeros (left join from the doc table)."""
    toks = docs.select(
        id_col,
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("word"),
    )
    enc = encode_distinct_words(toks, merges)
    per = (
        toks.join(enc, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_bpe_tokens"),
        )
    )
    return docs.select(id_col).join(per, id_col, "left").select(
        id_col,
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias("n_bpe_tokens"),
    )


def learn_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Distributed BPE TRAINING (the learn side of the GPT-2 tokenizer;
    the apply side is ``bpe_word``): repeatedly pick the adjacent
    symbol pair with the highest frequency-weighted corpus count and
    append it to the merge table.  Deterministic tie-break: count desc,
    then (x, y) lexicographic asc.

    100-TB shape: ONE corpus scan builds the weighted distinct-word
    frame (vocabulary-sized — a 10^12-token corpus with a 10^6-word
    vocabulary collapses 6 orders of magnitude here), checkpointed and
    reused every round.  Each of the k rounds re-encodes DISTINCT words
    under the current table (broadcast ranks, one Arrow stage), explodes
    adjacent piece pairs weighted by word frequency, and resolves the
    argmax with a partial-agg groupBy + 1-row collect.  The corpus is
    never rescanned; driver state is the k-row merge table itself.

    Returns [(x, y, weighted_count), ...] in learned (rank) order.
    """
    words = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=True)  # vocab-sized, probed k times
    )
    merges: list[tuple[str, str]] = []
    learned: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        enc = encode_distinct_words(words, merges)
        pairs = (
            enc.where(F.size("pieces") >= 2)  # sequence(1,0) runs BACKWARD
            .join(words, "word")
            .select(
                "w",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(pieces) - 1), "
                        "i -> struct(pieces[i - 1] AS x, pieces[i] AS y))"
                    )
                ).alias("p"),
            )
            .groupBy("p.x", "p.y")
            .agg(F.sum("w").alias("cnt"))
        )
        top = pairs.orderBy(
            F.desc("cnt"), F.asc("x"), F.asc("y")
        ).limit(1).collect()
        if not top:
            break
        r = top[0]
        merges.append((r.x, r.y))
        learned.append((r.x, r.y, int(r.cnt)))
    return learned
