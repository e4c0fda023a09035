"""Text-analysis column expressions for training-data pipelines.

All JVM-side (`pyspark.sql.functions` only — no Python UDFs): token
extraction, language-ID heuristic, quality scoring, fingerprinting.
Every formula is also expressible in ANSI SQL (see queries.py oracles),
and float-valued scores are integer-scaled with ``floor(x*K + 0.5)`` so
results are bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RX = "[a-z0-9]+"

# deterministic stopword lists for the language-ID vote
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "une"],
    "es": ["el", "los", "las", "es", "en", "para", "una", "del"],
}


def tokens(col: str | Column = "text") -> Column:
    """Lowercased alnum tokens (the BPE-ish tokenizer baseline)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RX), F.lit(0))


def distinct_tokens(col: str | Column = "text") -> Column:
    return F.array_distinct(tokens(col))


def token_count(col: str | Column = "text") -> Column:
    return F.size(tokens(col))


def scaled(expr: Column, k: int = 1000) -> Column:
    """floor(x*k + 0.5) as bigint — engine-portable rounding."""
    return F.floor(expr * k + F.lit(0.5)).cast("long")


def stopword_count(col: str | Column, lang: str) -> Column:
    """Count of DISTINCT tokens that are stopwords of ``lang``."""
    return F.size(
        F.array_intersect(
            distinct_tokens(col), F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        )
    )


def lang_guess(col: str | Column = "text") -> Column:
    """Stopword-vote language ID with fixed priority order en>de>fr>es
    on ties (deterministic; identical CASE chain in the SQL oracle)."""
    en, de, fr, es = (stopword_count(col, l) for l in ("en", "de", "fr", "es"))
    return (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de >= es) & (de > 0), F.lit("de"))
        .when((fr >= es) & (fr > 0), F.lit("fr"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def punct_count(col: str | Column = "text") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, "[.,!?;:]", ""))


def quality_features(col: str | Column = "text") -> dict[str, Column]:
    """Quality-score features, ratios scaled ×1000 as bigint."""
    toks = tokens(col)
    n = F.size(toks)
    n_d = F.size(F.array_distinct(toks))
    c = F.col(col) if isinstance(col, str) else col
    all_stop = F.array(
        *[F.lit(w) for ws in STOPWORDS.values() for w in ws]
    )
    stop_n = F.size(F.array_intersect(F.array_distinct(toks), all_stop))
    safe_n = F.when(n > 0, n.cast("double")).otherwise(F.lit(None))
    return {
        "n_tokens": n.cast("long"),
        "uniq_ratio_x1000": scaled(n_d / safe_n),
        "stop_ratio_x1000": scaled(stop_n / safe_n),
        "punct_ratio_x1000": scaled(
            punct_count(col) / F.when(F.length(c) > 0, F.length(c).cast("double"))
        ),
    }


def quality_bucket(col: str | Column = "text") -> Column:
    """Coarse quality label from the scaled features (deterministic)."""
    f = quality_features(col)
    return (
        F.when(f["n_tokens"] < 10, F.lit("too_short"))
        .when(f["uniq_ratio_x1000"] < 300, F.lit("repetitive"))
        .when(f["stop_ratio_x1000"] == 0, F.lit("no_stopwords"))
        .otherwise(F.lit("ok"))
    )


def _let1(bound: Column, body) -> Column:
    """LET-bind ``bound`` via a singleton transform — the lambda
    variable is a VALUE, so ``body`` may reference it any number of
    times (including inside nested per-element lambdas) while the
    bound expression is evaluated exactly ONCE per row.  Without this,
    an expression referenced inside a transform lambda is re-evaluated
    PER ELEMENT: ngram_strings re-ran the tokenizer regex once per
    gram — ~2.7 s of a 3.3 s gopher_repetition run at sf0.1 (r7)."""
    return F.get(F.transform(F.array(bound), body), 0)


def ngram_strings(col: str | Column = "text", n: int = 3) -> Column:
    """All consecutive token n-grams of a document as space-joined
    strings (array<string>); empty array when the doc has < n tokens.
    JVM-side (sequence → transform → slice); the Gopher-style
    repetition signals are aggregations over this array's explode.
    The token array is let-bound (see _let1), so the tokenizer regex
    runs once per row, not once per gram."""

    def build(t: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        )
        # sequence(1, k) with k < 1 counts DOWN — guard short docs
        return F.when(F.size(t) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    return _let1(tokens(col), build)


def passage_strings(col: str | Column = "text", chunk: int = 10) -> Column:
    """Non-overlapping ``chunk``-token passages of a document as
    space-joined strings (the C4-style paragraph analog for
    single-line text; last passage may be shorter).  Empty array for
    zero-token docs.  Token array let-bound like ngram_strings."""

    def build(t: Column) -> Column:
        n_chunks = F.ceil(F.size(t) / F.lit(chunk)).cast("int")
        ps = F.transform(
            F.sequence(F.lit(0), n_chunks - F.lit(1)),
            lambda i: F.concat_ws(" ", F.slice(t, i * chunk + F.lit(1), chunk)),
        )
        return F.when(F.size(t) > 0, ps).otherwise(
            F.array().cast("array<string>")
        )

    return _let1(tokens(col), build)


def content_fingerprint(col: str | Column = "text") -> Column:
    """Normalized-content fingerprint: md5 over the token join — the
    document analog of the reference's content hashing
    (surfactant/fileinfo.py:47-78)."""
    return F.md5(F.concat_ws(" ", tokens(col)))


# --- PII scrubbing (training-data hygiene) ---------------------------------
# Patterns chosen for cross-engine determinism: RE2 (DuckDB) and Java
# regex (Spark) agree on these exactly — character classes + bounded
# repetition + \b only, no lookarounds, no backrefs.
PII_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{2}-\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def scrub_pii(col: str | Column = "text") -> Column:
    """Replace emails, dotted-quad IPs, and TPC-H-style phone numbers
    with typed placeholder tokens — the standard pre-training scrub
    pass, as a pure chained ``regexp_replace`` column expression
    (whole-stage codegen; no UDF, no shuffle; order fixed so an email's
    host part is consumed before the IP pattern can see it)."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def pii_hits(col: str | Column = "text") -> Column:
    """How many PII placeholders a scrub of ``col`` would insert —
    cheap audit metric (count the replacements, not the rows)."""
    src = F.col(col) if isinstance(col, str) else col
    total = F.lit(0)
    for pat, _rep in PII_PATTERNS:
        total = total + F.size(F.regexp_extract_all(src, F.lit(pat), F.lit(0)))
    return total.cast("long")


def hashed_feature_weights(col: str | Column = "text", mod: int = 2001) -> Column:
    """Feature-hashed per-token weights (array<long>): each token maps
    to a bucket via the first 4 hex chars of ``md5('w|' || token)``
    (the engine-portable hash idiom shared with the sampling family),
    then to a non-negative weight ``bucket % mod`` in [0, mod).

    This is the fastText-style linear-classifier kernel with a
    deterministic weight table — the hashing-trick plumbing (tokenize →
    hash → lookup → aggregate) is the real thing; a trained model just
    swaps the weight expression for a broadcast array lookup.  Pure
    codegen projection: no UDF, no shuffle.
    """
    return F.transform(
        tokens(col),
        lambda tok: F.conv(
            F.substring(F.md5(F.concat(F.lit("w|"), tok)), 1, 4), 16, 10
        ).cast("long")
        % mod,
    )


def hashed_quality_score(col: str | Column = "text", mod: int = 2001) -> Column:
    """Mean hashed-feature weight ×1000: ``floor(sum(w) * 1000 /
    n_tokens)``.  Weights are non-negative integers and the quotient's
    denominator is far from double-rounding range, so floor of the
    double division equals exact integer floor division — bit-identical
    to the oracle's ``(sum * 1000) // n``.  NULL for zero-token docs."""
    w = hashed_feature_weights(col, mod)
    total = F.aggregate(w, F.lit(0).cast("long"), lambda acc, x: acc + x)
    n = F.size(w)
    return F.when(n > 0, F.floor(total * 1000 / n).cast("long"))


def canonical_url(col: str | Column = "url") -> Column:
    """Canonicalize an absolute http(s) URL — the web-crawl identity
    normalization that precedes url-keyed dedup and the host-graph
    collapse (two spellings of one page must collide BEFORE hashing):

    * scheme and host lowercased
    * ``#fragment`` stripped
    * scheme-default port stripped (``:80`` http, ``:443`` https)
    * duplicate slashes in the path collapsed, empty path → ``/``
    * trailing ``/index.html`` / ``/index.htm`` → ``/``
    * query parameters sorted (and empty params dropped), ``?`` dropped
      when the query is empty

    Pure codegen column expression (regexp/array built-ins from the
    RE2∩Java-regex portable subset — the oracle replays the identical
    steps), so canonicalization rides the scan: no shuffle, no UDF.

    Reference parity: Surfactant normalizes paths before identity joins
    (utils/paths normpath usage); URLs are the webtext analog.
    """
    u = F.col(col) if isinstance(col, str) else col
    u = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, "^[^:]+://([^/?#]+)", 1))
    host = F.when(
        scheme == "http", F.regexp_replace(host, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    path = F.regexp_extract(u, "^[^:]+://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.regexp_replace(path, "/{2,}", "/")
    path = F.regexp_replace(path, "/index\\.html?$", "/")
    query = F.regexp_extract(u, "\\?([^#]*)", 1)
    # array_remove + sort_array instead of filter(lambda)/array_sort:
    # identical output (split yields no NULL elements, so null-ordering
    # differences can't arise; removing '' elements ≡ the lambda), but
    # these are codegen expressions where the lambda HOFs are
    # CodegenFallback — one HOF dropped the ENTIRE canonicalization
    # projection out of whole-stage codegen, which also disabled
    # common-subexpression elimination and re-evaluated the fragment-
    # strip/scheme/host regexes per use (~25 interpreted regex ops per
    # row; see plans/r07/url_canon_before.txt).
    query = F.array_join(
        F.sort_array(F.array_remove(F.split(query, "&"), "")), "&"
    )
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


# Gopher quality-filter rules (Rae et al. 2021, published thresholds),
# reformulated integer-exact: every ratio is a scaled BIGINT computed
# with floor semantics (floor(a*1000/b) on small positive longs is
# exact in double and equals DuckDB's integer `//`), so the keep/drop
# decision is bit-identical across engines and partitionings.
# Words are whitespace tokens (the paper's definition), not TOKEN_RX.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def ws_words(col: str | Column = "text") -> Column:
    """Whitespace-delimited words (empty strings dropped)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


def gopher_features(col: str | Column = "text") -> dict[str, Column]:
    """The Gopher rule inputs as integer columns (ratios ×1000).

    Pure codegen projection — one pass over the text column, no
    shuffle, no UDF; at 100 TB this rides the parquet scan.
    Reference parity: the composite predicate plays the role of
    Surfactant's include/exclude file filters (F4) for corpus curation.
    """
    c = F.col(col) if isinstance(col, str) else col
    w = ws_words(col)
    n = F.size(w).cast("long")
    sum_len = F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    alpha_n = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("long")
    hash_n = F.length(c) - F.length(F.regexp_replace(c, "#", ""))
    ellipsis_n = F.floor(
        (F.length(c) - F.length(F.regexp_replace(c, r"\.\.\.", ""))) / 3
    ).cast("long")
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.array_intersect(F.array_distinct(F.transform(w, F.lower)), stops)
    ).cast("long")
    nz = F.when(n > 0, n)
    return {
        "n_words": n,
        "mean_word_len_x1000": F.floor(sum_len * 1000 / nz).cast("long"),
        "symbol_ratio_x1000": F.floor((hash_n + ellipsis_n) * 1000 / nz).cast("long"),
        "alpha_ratio_x1000": F.floor(alpha_n * 1000 / nz).cast("long"),
        "stop_hits": stop_hits,
    }


def gopher_keep(col: str | Column = "text", min_words: int = 50,
                max_words: int = 100_000, min_stop_hits: int = 2) -> Column:
    """The published composite keep predicate over gopher_features:
    word count in [min_words, max_words], mean word length in [3, 10],
    symbol-to-word ratio ≤ 0.1, ≥80% words with an alphabetic char,
    ≥min_stop_hits distinct required stopwords (paper default 2)."""
    f = gopher_features(col)
    return (
        (f["n_words"] >= min_words) & (f["n_words"] <= max_words)
        & (f["mean_word_len_x1000"] >= 3000) & (f["mean_word_len_x1000"] <= 10000)
        & (f["symbol_ratio_x1000"] <= 100)
        & (f["alpha_ratio_x1000"] >= 800)
        & (f["stop_hits"] >= min_stop_hits)
    )


# Unicode script ranges for the script-mix signal (BMP blocks, so
# char counts agree across engines' length() semantics)
SCRIPT_RANGES = {
    "latin": "[A-Za-z]",
    "cjk": "[\\x{4E00}-\\x{9FFF}]",
    "cyrillic": "[\\x{0400}-\\x{04FF}]",
    "arabic": "[\\x{0600}-\\x{06FF}]",
}


def script_counts(col: str | Column = "text") -> dict[str, Column]:
    """Per-script character counts (Latin/CJK/Cyrillic/Arabic BMP
    blocks) — the multilingual curation signal that routes documents
    to per-script tokenizers and quality models.  Counted as
    ``length(s) - length(regexp_replace(s, class, ''))`` so the same
    expression runs in any engine; pure codegen projection."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: (F.length(c) - F.length(F.regexp_replace(c, rng, "")))
        .cast("long")
        .alias(f"n_{name}")
        for name, rng in SCRIPT_RANGES.items()
    }


def dominant_script(col: str | Column = "text") -> Column:
    """argmax script with a fixed priority order on ties
    (latin > cjk > cyrillic > arabic; 'none' when no script chars) —
    the same deterministic CASE chain as the language-ID vote."""
    s = script_counts(col)
    la, cj, cy, ar = (s[k] for k in ("latin", "cjk", "cyrillic", "arabic"))
    return (
        F.when((la >= cj) & (la >= cy) & (la >= ar) & (la > 0), F.lit("latin"))
        .when((cj >= cy) & (cj >= ar) & (cj > 0), F.lit("cjk"))
        .when((cy >= ar) & (cy > 0), F.lit("cyrillic"))
        .when(ar > 0, F.lit("arabic"))
        .otherwise(F.lit("none"))
    )
