"""Crawl-politeness operators: robots.txt parsing and URL matching.

The decode side (``parse_robots_txt``) is a from-scratch parser for
the documented RFC 9309 subset: user-agent groups, Allow/Disallow
path-prefix rules, longest-match-wins with Allow breaking ties;
``*``/``$`` wildcards inside paths are NOT interpreted (documented
non-goal — the rules that use them are carried verbatim and match as
literals).  The match side (``robots_match``) is the scale-relevant
operator: a host equi-join of the URL table against the rules table
plus a per-URL longest-rule window.

Reference parity: the include/exclude predicate family (F4,
surfactant/cmd/generate.py filter flow) re-expressed for crawl
politeness — same shape, per-host rule sets instead of glob lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots_txt(text: str, agent: str = "*") -> list[tuple[str, bool]]:
    """robots.txt → ordered [(path_prefix, allow)] for ``agent``.

    Group selection per RFC 9309: the group(s) whose User-agent line
    equals ``agent`` case-insensitively win; if none, the ``*``
    group(s) apply.  Comments (#) and blank lines are ignored; empty
    Disallow means allow-all (contributes no rule).
    """
    groups: list[tuple[list[str], list[tuple[str, bool]]]] = []
    agents: list[str] = []
    rules: list[tuple[str, bool]] = []
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, val = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                groups.append((agents, rules))
                agents, rules = [], []
                in_group_body = False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if val:
                rules.append((val, key == "allow"))
        # other keys (crawl-delay, sitemap) end no group and add no rule
    if agents or rules:
        groups.append((agents, rules))
    want = agent.lower()
    exact = [r for a, rs in groups if want in a for r in rs]
    if exact or any(want in a for a, _ in groups):
        return exact
    return [r for a, rs in groups if "*" in a for r in rs]


def robots_rules_frame(spark, robots: dict[str, str], agent: str = "*"):
    """{host: robots.txt text} → rules DataFrame
    (host, prefix, allow) — parsed driver-side (robots corpora are
    dictionary-sized: one small text per host)."""
    rows = [
        (host, prefix, allow)
        for host, txt in robots.items()
        for prefix, allow in parse_robots_txt(txt, agent)
    ]
    return spark.createDataFrame(rows, "host string, prefix string, allow boolean")


def robots_match(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Apply per-host robots rules to a URL table.

    Adds ``allowed`` (boolean; default TRUE when no rule matches) and
    ``rule`` (the winning prefix, '' if none).  Winner per RFC 9309:
    among rules whose prefix is a string prefix of the URL path, the
    LONGEST wins; equal lengths break toward Allow.

    100-TB shape: host/path extraction is a codegen projection; the
    rule decision depends only on (host, path), so winners are
    resolved ONCE per DISTINCT (host, path) — an inner broadcast join
    of the (much smaller) distinct-page frame against the rules plus
    a longest-rule window over matches only — and the full URL table
    just left-joins the decision back (broadcast when the distinct
    frame is small, shuffle otherwise; either way the rule regexes
    and the window never touch the full table, and duplicate URLs
    keep their row count).
    """
    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1)
    )
    path = F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    u = urls.withColumn("_host", host).withColumn("_path", path)
    pages = u.select("_host", "_path").distinct()
    matches = pages.join(
        F.broadcast(rules), pages["_host"] == rules["host"]
    ).where(F.col("_path").startswith(F.col("prefix")))
    w = Window.partitionBy("_host", "_path").orderBy(
        F.desc(F.length("prefix")), F.desc("allow")
    )
    winners = (
        matches.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("_host", "_path", "allow", "prefix")
    )
    return (
        u.join(winners, ["_host", "_path"], "left")
        .select(
            *[F.col(c) for c in urls.columns],
            F.coalesce("allow", F.lit(True)).alias("allowed"),
            F.coalesce("prefix", F.lit("")).alias("rule"),
        )
    )


def resolve_redirects(
    redirects: DataFrame,
    max_hops: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Resolve HTTP redirect chains to their terminal targets — the
    crawl-side canonicalization that precedes URL-keyed dedup (a page
    reachable through 301 hops must collapse onto its final URL).

    Input is an edge list ``src → dst``; a src with several recorded
    targets keeps the smallest (deterministic).  Resolution is
    pointer DOUBLING: after k rounds every chain of length ≤ 2^k is
    fully resolved, so ``max_hops`` (bound, not count) costs
    ⌈log2⌉ self-joins — the connected-components trick applied to a
    functional graph.  Cycles cannot resolve and fall out naturally:
    a node whose final target still has an outgoing redirect after
    the rounds is flagged ``resolved = false`` (its ``final`` column
    is still deterministic — same doubling, any partitioning).

    Output: (url, final, resolved).

    100-TB shape: each round is one equi-join of the mapping against
    itself (pre-partition by the join key at cluster scale) with
    lineage truncated per round; redirect tables are ~1% of the crawl,
    so the frames stay small relative to the page table they serve.
    """
    import math

    base = (
        redirects.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .groupBy("u")
        .agg(F.min("v").alias("v"))
        .localCheckpoint(eager=False)
    )
    cur = base
    for _ in range(max(1, math.ceil(math.log2(max(2, max_hops))))):
        a, b = cur.alias("a"), cur.alias("b")
        cur = (
            a.join(b, F.col("a.v") == F.col("b.u"), "left")
            .select(
                F.col("a.u").alias("u"),
                F.coalesce(F.col("b.v"), F.col("a.v")).alias("v"),
            )
            .localCheckpoint(eager=False)
        )
    srcs = base.select(F.col("u").alias("v")).distinct()
    return (
        cur.join(srcs, "v", "left_anti")
        .select("u", "v", F.lit(True).alias("resolved"))
        .unionByName(
            cur.join(srcs, "v", "left_semi")
            .select("u", "v", F.lit(False).alias("resolved"))
        )
        .select(
            F.col("u").alias("url"),
            F.col("v").alias("final"),
            "resolved",
        )
    )


_SITEMAP_BLOCK = r"(?s)<{tag}>(.*?)</{tag}>"
_LOC_RE = r"(?s)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?s)<lastmod>\s*(.*?)\s*</lastmod>"


def parse_sitemap_entries(
    sitemaps: DataFrame, xml_col: str = "xml", src_col: str = "src"
) -> DataFrame:
    """Sitemap XML documents → (src, kind, loc, lastmod) entries.

    ``<urlset>`` bodies yield ``kind='page'`` rows (one per ``<url>``
    block); ``<sitemapindex>`` bodies yield ``kind='sitemap'`` rows
    (one per ``<sitemap>`` block) that the crawl frontier follows —
    feed them back through the fetch stage and this parser for the
    standard two-level index expansion (composes with
    expand_fixpoint, the reference's work-queue shape at
    surfactant/cmd/generate.py's queue loop).

    Sitemaps are machine-generated XML, so extraction is a pure
    codegen expression pipeline (regexp block scan → per-block field
    extracts); no Python, no shuffle — the plan is scan+project and
    parallelizes with input splits at any scale.  ``lastmod`` is NULL
    when absent; entries without ``<loc>`` are dropped.
    """

    def entries(tag: str, kind: str) -> DataFrame:
        pat = _SITEMAP_BLOCK.format(tag=tag)
        return (
            sitemaps.select(
                F.col(src_col).alias("src"),
                F.explode(
                    F.regexp_extract_all(F.col(xml_col), F.lit(pat), 1)
                ).alias("blk"),
            )
            .select(
                "src",
                F.lit(kind).alias("kind"),
                F.regexp_extract("blk", _LOC_RE, 1).alias("loc"),
                F.nullif(
                    F.regexp_extract("blk", _LASTMOD_RE, 1), F.lit("")
                ).alias("lastmod"),
            )
            .where(F.col("loc") != "")
        )

    return entries("url", "page").unionByName(entries("sitemap", "sitemap"))


def schedule_frontier(
    frontier: DataFrame,
    per_host_k: int = 3,
    global_n: int = 1000,
    host_col: str = "host",
    score_col: str = "score",
    url_col: str = "url",
) -> DataFrame:
    """Politeness-budgeted crawl scheduling: keep at most
    ``per_host_k`` URLs per host (by score, URL tie-break), then the
    global top ``global_n`` — the batch that actually goes to the
    fetchers.  The per-host cap is the politeness budget; the global
    cap is fetcher capacity.

    Scale shape: the per-host cap plans as WindowGroupLimit (Spark
    ≥3.5 pushes the limit BELOW the exchange — each map task keeps
    only k rows per host before shuffling), and the global cap is
    TakeOrderedAndProject (per-partition top-N, then a driver-side
    merge of N-row heaps — never a full sort of the frontier).
    Ordering is fully deterministic: (score DESC, url ASC) with
    unique URLs.
    """
    w = Window.partitionBy(host_col).orderBy(
        F.desc(score_col), F.asc(url_col)
    )
    return (
        frontier.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= per_host_k)
        .drop("_rn")
        .orderBy(F.desc(score_col), F.asc(url_col))
        .limit(global_n)
    )


def registrable_domain(
    df: DataFrame,
    psl_rules: list[str],
    host_col: str = "host",
    out_col: str = "reg_domain",
) -> DataFrame:
    """Public-Suffix-List registrable-domain extraction (eTLD+1) —
    the grouping key web pipelines actually want ("same site"), since
    naive last-two-labels breaks on multi-label suffixes (co.uk) and
    wildcard TLDs (*.ck).  Implements the published PSL algorithm
    subset: exact rules, ``*.`` wildcard rules (one label), ``!``
    exception rules; exception beats everything, else longest rule;
    no match defaults to the bare TLD.  ``out_col`` is NULL when the
    host IS a public suffix.

    Scale shape: suffix candidates are generated per DISTINCT host
    with pure array expressions (≤ 2·n_labels keys per host), the
    rule table broadcasts (the real PSL is ~9k rows), the winner is a
    max(struct(is_exception, n_labels)) partial agg, and the result
    equi-joins back to the input — duplicate hosts never pay twice.
    """
    spark = df.sparkSession
    rrows = []
    for r in psl_rules:
        exc = r.startswith("!")
        body = r[1:] if exc else r
        n = len(body.split("."))
        rrows.append((body, exc, n - 1 if exc else n))
    rules = spark.createDataFrame(rrows, ["rule", "is_exc", "ps_labels"])

    # labels materialized as a column so the per-suffix lambdas below
    # reference an attribute — the inline split used to re-run per
    # candidate element (textfx._let1 rationale)
    hosts = df.select(F.col(host_col).alias("_h")).distinct().select(
        "_h", F.split(F.col("_h"), r"\.").alias("_labels")
    )
    labels = F.col("_labels")
    tail = lambda i: F.array_join(  # noqa: E731
        F.slice(labels, i, F.size(labels)), "."
    )
    cand = hosts.select(
        "_h",
        F.size(labels).alias("_nl"),
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.size(labels)),
                    lambda i: F.array_compact(
                        F.array(
                            tail(i),
                            F.when(
                                i < F.size(labels),
                                F.concat(F.lit("*."), tail(i + 1)),
                            ),
                        )
                    ),
                )
            )
        ).alias("_key"),
    )
    winners = (
        cand.join(F.broadcast(rules), cand["_key"] == rules["rule"])
        .groupBy("_h")
        .agg(F.max(F.struct("is_exc", "ps_labels")).alias("_w"))
        .select("_h", F.col("_w.ps_labels").alias("_ps"))
    )
    resolved = (
        hosts.join(winners, "_h", "left")
        .select(
            "_h",
            F.coalesce("_ps", F.lit(1)).alias("_ps"),
            F.size(labels).alias("_nl"),
        )
        .select(
            "_h",
            F.when(
                F.col("_nl") > F.col("_ps"),
                F.array_join(
                    F.slice(
                        F.split(F.col("_h"), r"\."),
                        F.col("_nl") - F.col("_ps"),
                        F.col("_ps") + F.lit(1),
                    ),
                    ".",
                ),
            ).alias(out_col),
        )
    )
    return df.join(
        resolved, df[host_col] == resolved["_h"], "left"
    ).drop("_h")
