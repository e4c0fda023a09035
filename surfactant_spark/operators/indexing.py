"""Inverted-index construction over the document corpus.

The retrieval-side complement of the dedup/similarity family: term →
bounded posting list.  At 100 TB the classic failure mode is the
stopword term whose posting list is the whole corpus; postings are
therefore CAPPED at the k highest-tf documents per term, and the cap
is planned as a ``WindowGroupLimit`` — Spark 4 pushes the per-term
top-k BELOW the exchange, so every map task keeps at most k rows per
term before anything shuffles (the same property the sampling
family's ``group_topk_by_hash`` relies on; see EXPLAIN.md).

Document frequency is computed on a separate partial-agg groupBy of
the full tf frame (it must count ALL postings, not the capped ones).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, term, tf) — one explode + one partial-agg groupBy."""
    toks = docs.select(
        id_col,
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("term"),
    )
    return toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def build_inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """term → (df, capped posting string).  Postings keep the k
    highest-tf documents per term (ties broken by ascending doc id),
    packed ``doc:tf|doc:tf|...`` in rank order — deterministic and
    engine-portable.  ``df`` is the UNCAPPED document frequency.
    """
    tf = term_frequencies(docs, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc(id_col))
    top = (
        tf.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
    )
    postings = top.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", id_col, "tf"))),
                lambda s: F.concat_ws(":", s[id_col].cast("string"),
                                      s["tf"].cast("string")),
            ),
            "|",
        ).alias("postings")
    )
    return dfreq.join(postings, "term").select("term", "df", "postings")
