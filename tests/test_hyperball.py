"""HyperBall harmonic centrality (graphquery.hyperball_harmonic) vs a
pure-Python register-level replica and exact bounded reachability."""

from __future__ import annotations

import hashlib

from surfactant_spark.operators.graphquery import hyperball_harmonic

EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
    ("a", "f"), ("f", "g"), ("g", "a"), ("e", "h"),
    ("h", "i"), ("i", "j"), ("b", "g"), ("c", "f"),
]


def _jr(node: str) -> tuple[int, int]:
    h = hashlib.md5(node.encode()).hexdigest()
    j = int(h[:2], 16) % 16
    x = int(h[2:10], 16)
    r = 32 if x == 0 else 33 - (x.bit_length())
    return j, r


def py_hyperball(edges, rounds=3):
    nodes = sorted({x for e in edges for x in e})
    out_nb = {}
    for u, v in set(edges):
        out_nb.setdefault(u, set()).add(v)
    regs = {n: {} for n in nodes}
    for n in nodes:
        j, r = _jr(n)
        regs[n][j] = max(regs[n].get(j, 0), r)

    def est(rg):
        from surfactant_spark.operators.graphquery import (
            hll16_linear_counting_table,
        )

        den = sum(1 << (32 - r) for r in rg.values()) + (16 - len(rg)) * (1 << 32)
        raw = (172288 * (1 << 32)) // den
        v = 16 - len(rg)
        if raw <= 40000 and v >= 1:
            return hll16_linear_counting_table()[v - 1]
        return raw

    ests = {n: [est(regs[n])] for n in nodes}
    for _t in range(rounds):
        new = {n: dict(regs[n]) for n in nodes}
        for u in nodes:
            for v in out_nb.get(u, ()):
                for j, r in regs[v].items():
                    new[u][j] = max(new[u].get(j, 0), r)
        regs = new
        for n in nodes:
            ests[n].append(est(regs[n]))
    res = {}
    for n in nodes:
        e = ests[n]
        harmonic = sum(
            max(e[t] - e[t - 1], 0) // t for t in range(1, rounds + 1)
        )
        res[n] = (e[rounds], harmonic)
    return res


def test_hyperball_matches_python_replica(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r.node: (r.reach_x1000, r.harmonic_x1000)
        for r in hyperball_harmonic(df, rounds=3).collect()
    }
    assert got == py_hyperball(EDGES)


def test_hyperball_estimates_track_exact_reach(spark):
    """On a small graph the raw-HLL estimate (÷1000) must land within
    a loose factor of the exact ≤3-hop reach — it is an estimator, but
    with 16 registers and reach ≤ 10 it cannot be wildly off."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: r.reach_x1000 for r in hyperball_harmonic(df, rounds=3).collect()}

    out_nb = {}
    for u, v in set(EDGES):
        out_nb.setdefault(u, set()).add(v)

    def exact_reach(n, t=3):
        cur, seen = {n}, {n}
        for _ in range(t):
            cur = {w for x in cur for w in out_nb.get(x, ())} - seen
            seen |= cur
        return len(seen)

    for n, est_x1000 in got.items():
        exact = exact_reach(n)
        assert 0.3 * exact <= est_x1000 / 1000 <= 3.0 * exact, (n, exact, est_x1000)


def test_hyperball_monotone_deltas(spark):
    """Registers only grow → harmonic is a sum of non-negative deltas,
    so it is non-negative and bounded by the final reach estimate."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    for r in hyperball_harmonic(df, rounds=3).collect():
        assert 0 <= r.harmonic_x1000 <= r.reach_x1000 * 3


def test_hll_group_distinct_accuracy(spark):
    """16-register HLL per-group distinct estimates land within the
    sketch's accuracy envelope vs exact counts (tight in the
    linear-counting regime, ~±40% at a few hundred distincts)."""
    import pyspark.sql.functions as F

    from surfactant_spark.operators.graphquery import hll_group_distinct

    df = spark.range(5000).select(
        (F.col("id") % 5).alias("g"),
        # group g holds (g+1)*100 distinct values
        F.concat(
            F.lit("v"),
            (F.col("id") % ((F.col("id") % 5 + 1) * 100)).cast("string"),
            F.lit("g"), (F.col("id") % 5).cast("string"),
        ).alias("val"),
    )
    exact = {
        r.g: r.n
        for r in df.groupBy("g").agg(
            F.countDistinct("val").alias("n")
        ).collect()
    }
    got = {
        r.key: r.distinct_x1000 / 1000
        for r in hll_group_distinct(df, "g", "val").collect()
    }
    assert set(got) == set(exact)
    for g, est in got.items():
        assert 0.6 * exact[g] <= est <= 1.6 * exact[g], (g, exact[g], est)
