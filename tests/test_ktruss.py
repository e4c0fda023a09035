"""k-truss peeling (graphquery.ktruss_peel) on hand-built graphs."""

from __future__ import annotations

from surfactant_spark.operators.graphquery import ktruss_peel

# K4 on {1,2,3,4}: every edge sits in 2 triangles → survives k=4.
K4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
# a triangle + a pendant path: triangle edges have support 1 → die at
# k=4 (needs 2), survive at k=3 (needs 1)
TRI = [(10, 11), (11, 12), (10, 12), (12, 13), (13, 14)]


def test_k4_clique_survives(spark):
    df = spark.createDataFrame(K4 + TRI, "src long, dst long")
    got = {
        (r.lo, r.hi): r.support
        for r in ktruss_peel(df, k=4, rounds=2).collect()
    }
    assert set(got) == set(K4)  # exactly the clique's 6 edges
    assert all(s == 2 for s in got.values())


def test_triangle_survives_k3_only(spark):
    df = spark.createDataFrame(TRI, "src long, dst long")
    k3 = {
        (r.lo, r.hi) for r in ktruss_peel(df, k=3, rounds=2).collect()
    }
    assert k3 == {(10, 11), (11, 12), (10, 12)}  # path edges dropped
    assert ktruss_peel(df, k=4, rounds=2).count() == 0


def test_peeling_cascades(spark):
    """Removing low-support edges in round 1 can strip support from
    edges that looked fine — the fixed rounds must re-count.  Two K4s
    sharing one edge: the shared edge has support 4 initially; after a
    k=5 (support ≥ 3) round every non-shared edge dies, and the shared
    edge's support collapses to 0 in round 2."""
    k4a = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    k4b = [(a, b) for a in (3, 4, 5, 6) for b in (3, 4, 5, 6) if a < b]
    df = spark.createDataFrame(
        sorted(set(k4a + k4b)), "src long, dst long"
    )
    assert ktruss_peel(df, k=5, rounds=2).count() == 0
    # at k=4 both cliques survive intact
    got = {
        (r.lo, r.hi) for r in ktruss_peel(df, k=4, rounds=2).collect()
    }
    assert got == set(k4a) | set(k4b)
