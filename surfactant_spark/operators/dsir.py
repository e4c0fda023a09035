"""DSIR-style importance weighting for training-data selection.

Re-expresses the public data-selection recipe of Xie et al., "Data
Selection for Language Models via Importance Resampling" (NeurIPS
2023): fit hashed-n-gram bag-of-words models for a *target*
distribution (the data you want more of) and the *raw* crawl
distribution, weight every raw document by

    log w(x) = Σ_f  c_f(x) · ( log p̂_target(f) − log p̂_raw(f) )

over hashed unigram+bigram feature buckets f, and keep the top-k (the
deterministic top-k variant of the paper's Gumbel resampling — same
ranking, replayable).

Spark-first shape, sized for 100 TB:

- the MODEL is ``n_buckets`` integers (micro-scaled log-ratios).  It is
  fit from two bucket-count aggregations (``bucket_counts`` — map-side
  combine into at most ``n_buckets`` rows, the cheapest possible
  groupBy) and thereafter travels as a LITERAL array inside the scoring
  expression — no join, nothing to shuffle.
- SCORING is a pure whole-stage-codegen projection: ONE ``aggregate``
  pass over the token array with a (score, previous-token) accumulator
  struct, so unigram and bigram contributions come out of a single
  traversal and the tokenizer regex appears exactly once in the plan
  (building a separate gram array would let CollapseProject inline the
  regexp 3x per row — the expression-recomputation trap, SCALING.md).
  Zero shuffles; rides the corpus scan.
- SELECTION is ``orderBy(score).limit(k)`` = TakeOrderedAndProject
  (per-partition top-k, driver merges k·partitions rows — never a
  global sort).

Integer exactness: the log-ratios are computed ONCE (driver-side, from
the two count vectors) and injected into both the Spark plan and the
DuckDB oracle, so both engines do only integer multiply-adds — the
same pre-trained-model pattern as the IVF coarse quantizer
(queries._ivf_centroids).  Reference parity: the reference engine has
no data-selection surface; this is beyond-reference functionality per
the training-data-pipeline mandate (SURVEY.md §6).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# token regex shared with functions/textfx.py (oracle side uses the
# same literal in DuckDB regexp_extract_all)
TOKEN_RX = "[a-z0-9]+"


def _bucket_sql(gram: str, n_buckets: int) -> str:
    """Spark-SQL expression: md5-derived bucket id of ``gram`` in
    [0, n_buckets).  Engine-portable: DuckDB spells the identical map
    as ``('0x' || substr(md5(g),1,4))::BIGINT % n``."""
    return (
        f"pmod(cast(conv(substring(md5({gram}), 1, 4), 16, 10) as bigint),"
        f" {n_buckets})"
    )


def _toks_sql(text_col: str) -> str:
    return f"regexp_extract_all(lower({text_col}), '{TOKEN_RX}', 0)"


def bucket_counts(
    docs: DataFrame, text_col: str = "text", n_buckets: int = 256
) -> DataFrame:
    """→ (bucket, cnt): hashed unigram+bigram occurrence counts over a
    corpus — the distributed model-fitting aggregation.  Output
    cardinality is ≤ ``n_buckets`` regardless of corpus size, so the
    shuffle after the map-side combine is ~n_buckets rows per task: the
    fit costs one corpus scan and nothing else.  (The gram array here
    does re-inline the tokenizer into the two bigram slices — a 3x
    tokenize paid ONCE at fit time, not per scoring pass.)"""
    toks = _toks_sql(text_col)
    bi = (
        f"zip_with(slice({toks}, 1, greatest(size({toks}) - 1, 0)), "
        f"slice({toks}, 2, greatest(size({toks}) - 1, 0)), "
        "(a, b) -> concat(a, ' ', b))"
    )
    return (
        docs.select(F.explode(F.expr(f"concat({toks}, {bi})")).alias("gram"))
        .select(F.expr(_bucket_sql("gram", n_buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def log_ratios(
    target_counts: dict[int, int],
    raw_counts: dict[int, int],
    n_buckets: int = 256,
    scale: int = 1_000_000,
) -> list[int]:
    """Micro-scaled add-1-smoothed log probability ratios per bucket —
    the trained DSIR model.  Pure driver arithmetic over two
    ``n_buckets``-sized count vectors (the output of ``bucket_counts``
    collected — bounded by construction)."""
    t_total = sum(target_counts.values()) + n_buckets
    r_total = sum(raw_counts.values()) + n_buckets
    out = []
    for b in range(n_buckets):
        p_t = (target_counts.get(b, 0) + 1) / t_total
        p_r = (raw_counts.get(b, 0) + 1) / r_total
        out.append(round(scale * (math.log(p_t) - math.log(p_r))))
    return out


def importance_score(
    text_col: str, lr: list[int], n_buckets: int = 256
) -> Column:
    """Integer importance score of a document: Σ over its unigrams and
    bigrams of the bucket's scaled log-ratio.  One SQL expression
    (single py4j call — literal-heavy Column trees cost ~2 s of driver
    time, see SCALING.md); the accumulator struct carries the previous
    token so bigrams fall out of the same single pass."""
    lits = ", ".join(f"{x}L" for x in lr)
    uni = f"element_at(array({lits}), cast({_bucket_sql('x', n_buckets)} as int) + 1)"
    # bigram bucket of concat(prev, ' ', x); '' prev sentinel = first
    # token (tokens are non-empty alnum, '' cannot collide)
    bigram_gram = "concat(acc.prev, ' ', x)"
    big = (
        f"element_at(array({lits}), "
        f"cast({_bucket_sql(bigram_gram, n_buckets)} as int) + 1)"
    )
    return F.expr(
        f"aggregate({_toks_sql(text_col)}, "
        "named_struct('s', 0L, 'prev', ''), "
        "(acc, x) -> named_struct("
        f"'s', acc.s + {uni} + if(acc.prev = '', 0L, {big}), "
        "'prev', x), "
        "acc -> acc.s)"
    )


def dsir_select(
    docs: DataFrame,
    lr: list[int],
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """Top-``k`` raw documents by DSIR importance weight → (id, score_u),
    deterministic tie-break on id.  TakeOrderedAndProject — safe at any
    corpus size."""
    return (
        docs.select(
            F.col(id_col),
            importance_score(text_col, lr, n_buckets).alias("score_u"),
        )
        .orderBy(F.desc("score_u"), F.asc(id_col))
        .limit(k)
    )
