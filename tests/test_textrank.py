"""TextRank keywords (indexing.textrank_keywords) vs a pure-Python
replica of the adjacent-pair graph + integer PageRank."""

from __future__ import annotations

import re

from surfactant_spark.operators.indexing import textrank_keywords

DOCS = [
    "spark shuffles data and spark joins tables",
    "catalyst optimizes spark plans",
    "tungsten executes plans fast",
    "data flows into tables",
]


def py_textrank(texts: list[str], iterations: int = 3) -> dict[str, int]:
    adj = set()
    for tx in texts:
        t = re.findall(r"[a-z0-9]+", tx.lower())
        for a, b in zip(t, t[1:]):
            if a != b:
                adj.add((a, b))
                adj.add((b, a))
    nodes = {x for e in adj for x in e}
    outdeg: dict[str, int] = {}
    for s, _ in adj:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {n: 1_000_000 for n in nodes}
    for _ in range(iterations):
        s: dict[str, int] = {}
        for a, b in adj:
            s[b] = s.get(b, 0) + rank[a] // outdeg[a]
        rank = {n: 150_000 + (85 * s.get(n, 0)) // 100 for n in nodes}
    return rank


def test_textrank_matches_python_replica(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )
    got = textrank_keywords(df, k=100).collect()
    exp = py_textrank(DOCS)
    assert {r.term: r.rank_u for r in got} == exp
    # hub word ("spark": adjacent to the most distinct neighbors) wins
    assert got[0].term == "spark"
    # output is (rank desc, term asc) deterministic
    keys = [(-r.rank_u, r.term) for r in got]
    assert keys == sorted(keys)


def test_textrank_self_pairs_and_k(spark):
    df = spark.createDataFrame(
        [(0, "echo echo echo alpha")], "doc_id long, text string"
    )
    got = textrank_keywords(df, k=1).collect()
    # self-pair (echo,echo) dropped; graph = echo<->alpha only
    assert len(got) == 1 and got[0].term in ("alpha", "echo")
