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
    from ..partitioning import spread

    docs = spread(docs, id_col)
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
                F.sort_array(F.collect_list(F.struct("rn", id_col, "tf"))),
                lambda s: F.concat_ws(":", s[id_col].cast("string"),
                                      s["tf"].cast("string")),
            ),
            "|",
        ).alias("postings")
    )
    return dfreq.join(postings, "term").select("term", "df", "postings")


def bm25_topk(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    k1_x100: int = 120,
    b_x100: int = 75,
) -> DataFrame:
    """Per-document top-k terms by an integer-exact BM25 variant.

    Classic BM25 with two engine-portability substitutions (documented
    deterministic variant, same shape as the tf-idf gate):

    * idf uses the log-free Robertson rational
      ``idf_u = ((2*(N-df)+1) * 1e6) div (2*df+1)`` — a strictly
      monotone transform of the classic ``log((N-df+0.5)/(df+0.5))``,
      so per-document term RANKINGS are identical;
    * the length normalization ``1 - b + b*dl/avgdl`` is scaled ×1000
      with floor division (``avgdl = T/N`` folded in as ``dl*N/T``).

    ``score_u = (idf_u * tf*(1+k1)×1000) div (tf×1000 + k1 × norm)``
    — all BIGINT, bit-identical across engines/partitionings.  Magnitude
    bound: idf_u ≤ (2N+1)e6, times tf·(1+k1)e3 stays < 2^63 for corpora
    to ~1e7 docs with tf ≤ 1e3; beyond that drop the 1e6 scale to 1e3.

    100-TB shape: tf groupBy (partial agg) + df groupBy + dl groupBy,
    one equi-join on term, one on doc id; N and T are two tiny agg jobs
    (table-metadata scale).  The top-k window plans as WindowGroupLimit
    (map-side partial top-k below the exchange).
    """
    tf = term_frequencies(docs, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl"))
    n_docs = docs.count()
    total = dl.agg(F.sum("dl")).collect()[0][0] or 0
    scored = (
        tf.join(dfreq, "term")
        .join(dl, id_col)
        .select(
            id_col,
            "term",
            "tf",
            F.expr(
                f"((2*({n_docs}L - df) + 1) * 1000000L) div (2*df + 1)"
            ).alias("idf_u"),
            F.expr(
                f"({100 - b_x100} * 10) + ({b_x100} * 10 * dl * {n_docs}L) div {total}L"
            ).alias("norm_x1000"),
        )
        .select(
            id_col,
            "term",
            F.expr(
                f"(idf_u * tf * {(100 + k1_x100) * 10}L) div "
                f"(tf * 1000 + ({k1_x100} * norm_x1000) div 100)"
            ).alias("score_u"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score_u"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(id_col, "term", F.col("score_u").cast("long").alias("score_u"),
                F.col("rn").cast("long").alias("rn"))
    )


def cooccurrence_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    max_terms: int = 64,
) -> DataFrame:
    """Term co-occurrence graph: (term_a, term_b, n_docs) for every
    unordered pair of distinct terms appearing in the same document —
    the relation-candidate generator of the KG side (edges between
    entities that share a context).

    100-TB shape: NO self-join of the token table (the naive
    ``toks a JOIN toks b ON a.doc = b.doc`` shuffles the corpus twice
    and explodes skewed docs).  Instead each document is reduced to
    its sorted distinct term array — TRUNCATED to the ``max_terms``
    alphabetically-first terms, a deterministic cap that bounds pair
    fan-out at max_terms²/2 per doc — and pairs are expanded with a
    pure array expression (cost = output size), then counted in one
    partial-agg groupBy.  The cap is the hot-doc guard: without it a
    100k-distinct-term doc alone emits 5e9 pairs.
    """
    from ..partitioning import spread

    docs = spread(docs, id_col)
    terms = docs.select(
        id_col,
        F.slice(
            F.sort_array(
                F.array_distinct(
                    F.expr(
                        f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
                    )
                )
            ),
            1,
            max_terms,
        ).alias("ts"),
    )
    ts = F.col("ts")
    pairs = F.flatten(
        F.transform(
            ts,
            lambda x, i: F.transform(
                F.slice(ts, i + F.lit(2), F.size(ts)),
                lambda y: F.struct(x.alias("term_a"), y.alias("term_b")),
            ),
        )
    )
    return (
        terms.select(F.explode(pairs).alias("p"))
        .select("p.term_a", "p.term_b")
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= min_count)
    )


def corpus_cube(
    docs: DataFrame,
    dims: tuple[str, ...] = ("lang", "source"),
    size_col: str = "n_chars",
) -> DataFrame:
    """Corpus composition report: CUBE over ``dims`` (every dimension
    subset, 'ALL' for rolled-up levels) with doc count + total size —
    the mixture dashboard a 100-TB ingest run publishes per snapshot.

    CUBE is a Spark-native grouping-sets aggregate: ONE shuffle
    produces all 2^|dims| groupings (the Expand node multiplies rows
    map-side, partial aggs still combine before the exchange) — vs
    2^|dims| separate groupBys each rescanning the corpus.
    """
    # grouping() is only legal inside the Cube aggregate list, so the
    # ALL-marking runs as agg columns and a post-select swaps them in.
    gflags = [F.grouping(d).alias(f"_g_{d}") for d in dims]
    gcols = [
        F.when(F.col(f"_g_{d}") == 1, F.lit("ALL"))
        .otherwise(F.col(d))
        .alias(d)
        for d in dims
    ]
    return (
        docs.cube(*dims)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(size_col).cast("long").alias("total_size"),
            *gflags,
        )
        .select(*gcols, "n_docs", "total_size")
    )


def vocab_coverage(
    docs: DataFrame,
    vocab_k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary-coverage quality signal: fraction of a doc's tokens
    found in the corpus's top-``vocab_k`` vocabulary — the cheap
    language-model-free fluency proxy (OOV-heavy docs are boilerplate,
    code, or the wrong language).  Integer-exact output: (doc_id,
    n_tokens, n_in_vocab); the caller divides.

    Vocabulary = top-k tokens by corpus frequency with deterministic
    (count DESC, token ASC) tie-break — a partial-agg groupBy over
    the exploded corpus, then TakeOrderedAndProject (never a full
    sort).  The coverage pass re-explodes and LEFT SEMI joins the
    (tiny, broadcast) vocabulary; per-doc counts come from one more
    partial-agg groupBy.  Token totals are anchored by a groupBy on
    the doc table itself, so zero-coverage docs still appear.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(vocab_k)
        .select("tok")
    )
    totals = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    hits = (
        toks.join(F.broadcast(vocab), "tok", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_in_vocab"))
    )
    return totals.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_in_vocab", F.lit(0).cast("long")).alias("n_in_vocab"),
    )


def negative_sampling_ranges(
    docs: DataFrame,
    text_col: str = "text",
    partitions: int = 32,
) -> DataFrame:
    """word2vec-style negative-sampling table: (term, count, weight,
    range_start) where weight is the SMOOTHED unigram count and
    range_start the cumulative weight of all alphabetically earlier
    terms — a sampler draws u ~ [0, total) and binary-searches the
    range column.

    Smoothing is floor(sqrt(count) * 1000): sqrt is IEEE-754
    correctly-rounded in every engine (unlike pow(x, 0.75), whose libm
    rounding varies), so the table is bit-identical across engines
    while keeping the sub-linear damping the 0.75-power serves in the
    original (frequent terms under-sampled relative to raw counts).

    Scale shape: counts are ONE partial-agg groupBy of the exploded
    corpus; the cumulative column is the distributed two-phase prefix
    sum from operators.ids (range partition + per-partition sums +
    broadcast offsets) — no single-partition window over the
    vocabulary."""
    from .ids import prefix_sums

    counts = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )
    w = F.floor(F.sqrt(F.col("count")) * 1000)
    ranges = prefix_sums(
        counts.select("term", "count", w.alias("w")),
        ["term"],
        "w",
        partitions=partitions,
    )
    return counts.join(ranges.select("term", "weight", "range_start"), "term").select(
        "term", "count", "weight", "range_start"
    )


def entity_salience(
    docs: DataFrame,
    vocab: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(document, entity-term) salience over a fixed vocabulary:
    frequency plus position-of-first-mention, the classic cheap
    salience heuristic (entities introduced early and repeated often
    matter).  salience_x1000 = (tf*1000 div n_tokens) +
    ((n_tokens - first_pos + 1)*1000 div n_tokens) — integral
    divisions only, engine-bit-identical.  Output (id, term, tf,
    first_pos, salience_x1000); 1-based token positions.

    Shape: one posexplode filtered against the LITERAL vocabulary
    (codegen array_contains — the vocab is query-sized, never a join)
    + one partial-agg groupBy; n_tokens is a projection on the doc
    table joined back on the doc key."""
    toks = docs.select(
        id_col,
        F.posexplode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("pos0", "term"),
    ).where(F.col("term").isin(vocab))
    per = toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        (F.min("pos0") + 1).cast("long").alias("first_pos"),
    )
    n_tok = docs.select(
        id_col,
        F.size(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).cast("long").alias("_n"),
    )
    n = F.col("_n")
    return per.join(n_tok, id_col).select(
        id_col,
        "term",
        "tf",
        "first_pos",
        (
            F.expr("tf * 1000 div _n")
            + F.expr("(_n - first_pos + 1) * 1000 div _n")
        ).cast("long").alias("salience_x1000"),
    )


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 25,
    iterations: int = 3,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, "TextRank:
    Bringing Order into Text", EMNLP 2004): build the unweighted
    undirected word co-occurrence graph (window = 2, i.e. adjacent
    token pairs anywhere in the corpus), run PageRank over it, return
    the top-``k`` terms → (term, rank_u).

    Spark-first shape: adjacent pairs come from a zip_with over two
    slices of the token array (array expressions — pair extraction is
    map-side, cost = number of token positions; the tokenizer regex is
    inlined 3x by CollapseProject, a linear CPU cost paid once at graph
    build, never per PageRank round).  The graph is the corpus-DISTINCT
    symmetric pair set — bounded by vocab², in practice ≪ corpus size —
    and the rank loop is graphquery.pagerank_int (integer micro-units,
    engine-exact, one partial-agg shuffle + one equi-join per round).
    Top-k is TakeOrderedAndProject.  Composition gate: co-occurrence
    extraction ∘ pagerank, both independently oracle-gated."""
    from .graphquery import pagerank_int
    from ..partitioning import spread

    # tokenize+pair-expand is the heavy projection: widen narrow scans
    docs = spread(docs)
    toks = f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
    pairs = (
        f"zip_with(slice({toks}, 1, greatest(size({toks}) - 1, 0)), "
        f"slice({toks}, 2, greatest(size({toks}) - 1, 0)), "
        "(a, b) -> struct(a, b))"
    )
    adj = (
        docs.select(F.explode(F.expr(pairs)).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .where(F.col("a") != F.col("b"))
    )
    sym = (
        adj.union(adj.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    r = pagerank_int(sym, iterations=iterations)
    return (
        r.select(F.col("node").alias("term"), F.col("rank").alias("rank_u"))
        .orderBy(F.desc("rank_u"), F.asc("term"))
        .limit(k)
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 3,
    max_terms: int = 64,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` collocations by document-level PMI — the
    relation-candidate miner of the KG side (two terms that co-occur
    far more than chance are the edges worth verbalizing/linking).

    Integer-exact PMI ORDER: PMI(a,b) = log(n_ab·N / (n_a·n_b)) is
    monotone in n_ab/(n_a·n_b) at fixed corpus size, so the rank key
    ``score_u = n_ab·10¹² div (n_a·n_b)`` reproduces the PMI ordering
    without evaluating any log (integral-division ties are pinned by
    the (term_a, term_b) tie-break — the documented variant).

    Shape: ONE capped distinct-term projection feeds both the pair
    expansion and the unigram document frequencies (the same
    no-self-join array expansion as :func:`cooccurrence_pairs`; the
    cap bounds pair fan-out per doc); two partial-agg groupBys; counts
    joined back onto the (min_count-filtered, therefore much smaller)
    pair frame; top-k = TakeOrderedAndProject."""
    from ..partitioning import spread

    docs = spread(docs, id_col)
    terms = docs.select(
        id_col,
        F.slice(
            F.sort_array(
                F.array_distinct(
                    F.expr(
                        f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
                    )
                )
            ),
            1,
            max_terms,
        ).alias("ts"),
    )
    ts = F.col("ts")
    pairs_expr = F.flatten(
        F.transform(
            ts,
            lambda x, i: F.transform(
                F.slice(ts, i + F.lit(2), F.size(ts)),
                lambda y: F.struct(x.alias("term_a"), y.alias("term_b")),
            ),
        )
    )
    pair_counts = (
        terms.select(F.explode(pairs_expr).alias("p"))
        .select("p.term_a", "p.term_b")
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    term_counts = (
        terms.select(F.explode(ts).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_t"))
    )
    # BOTH join sides are corpus-scaled (term_counts is vocab-sized,
    # pair_counts can be ~doc·cap² before the HAVING bites), so pin
    # sort-merge: the static planner has no stats here and at 1M docs
    # it guessed a broadcast of a >1 GiB side into the driver
    # (maxResultSize abort) — measured, tools/scale_new_ops.py
    scored = (
        pair_counts.join(
            term_counts.select(
                F.col("term").alias("term_a"), F.col("n_t").alias("n_a")
            ).hint("merge"),
            "term_a",
        )
        .join(
            term_counts.select(
                F.col("term").alias("term_b"), F.col("n_t").alias("n_b")
            ).hint("merge"),
            "term_b",
        )
        .select(
            "term_a",
            "term_b",
            "n_ab",
            F.expr("n_ab * 1000000000000L div (n_a * n_b)").alias("score_u"),
        )
    )
    return scored.orderBy(
        F.desc("score_u"), F.asc("term_a"), F.asc("term_b")
    ).limit(k)
