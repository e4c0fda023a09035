"""B-cubed clustering metric (dedup.bcubed_scores) vs hand-computed
values on the classic worked example."""

from __future__ import annotations

from surfactant_spark.operators.dedup import bcubed_scores

# 7 items; predicted clusters {1,2,3,4,5}=A,{6,7}=B; truth
# {1,2,3,4}=x,{5,6,7}=y  (the Amigó-style worked example)
ITEMS = [
    (1, "A", "x"), (2, "A", "x"), (3, "A", "x"), (4, "A", "x"),
    (5, "A", "y"), (6, "B", "y"), (7, "B", "y"),
]


def hand_bcubed(items):
    from collections import Counter

    np = Counter(p for _, p, _ in items)
    nt = Counter(t for _, _, t in items)
    ni = Counter((p, t) for _, p, t in items)
    pis = [ni[(p, t)] * 1_000_000 // np[p] for _, p, t in items]
    ris = [ni[(p, t)] * 1_000_000 // nt[t] for _, p, t in items]
    n = len(items)
    P, R = sum(pis) // n, sum(ris) // n
    return n, P, R, 2 * P * R // (P + R)


def test_bcubed_worked_example(spark):
    df = spark.createDataFrame(ITEMS, "doc_id long, pred string, truth string")
    (row,) = bcubed_scores(df, pred_col="pred", true_col="truth").collect()
    n, P, R, F = hand_bcubed(ITEMS)
    assert (row.n_items, row.b3_precision_x1e6, row.b3_recall_x1e6,
            row.b3_f1_x1e6) == (n, P, R, F)
    # spot values: item 1-4 precision 4/5, item 5 precision 1/5, 6-7 = 1
    assert P == (4 * 800000 + 200000 + 2 * 1000000) // 7


def test_bcubed_perfect_and_degenerate(spark):
    # identical labelings → P = R = F = 1.0
    perfect = [(i, "c%d" % (i % 2), "c%d" % (i % 2)) for i in range(6)]
    df = spark.createDataFrame(perfect, "doc_id long, pred string, truth string")
    (row,) = bcubed_scores(df, pred_col="pred", true_col="truth").collect()
    assert row.b3_precision_x1e6 == row.b3_recall_x1e6 == 1_000_000
    # all-in-one prediction vs all-singleton truth → P = avg 1/n, R = 1
    lump = [(i, "one", "t%d" % i) for i in range(4)]
    df = spark.createDataFrame(lump, "doc_id long, pred string, truth string")
    (row,) = bcubed_scores(df, pred_col="pred", true_col="truth").collect()
    assert row.b3_precision_x1e6 == 250_000
    assert row.b3_recall_x1e6 == 1_000_000
