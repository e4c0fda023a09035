"""CDC table_diff fixtures."""

from surfactant_spark.operators.merge import table_diff


def _frames(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, None, 41), (5, "e", 50)],
        ["k", "s", "v"],
    )
    return old, new


def test_table_diff_statuses(spark):
    old, new = _frames(spark)
    rows = {r.k: (r.change, list(r.changed_cols))
            for r in table_diff(old, new, ["k"]).collect()}
    # 1 is unchanged → filtered out by default
    assert 1 not in rows
    assert rows[2] == ("changed", ["s"])
    assert rows[3] == ("removed", [])
    assert rows[5] == ("added", [])
    # null→41: null-safe compare flags v, not s (both None)
    assert rows[4] == ("changed", ["v"])


def test_table_diff_include_unchanged_and_multicol(spark):
    old, new = _frames(spark)
    rows = {r.k: r.change
            for r in table_diff(
                old, new, ["k"], include_unchanged=True
            ).collect()}
    assert rows[1] == "unchanged"
    # both columns differ → sorted changed_cols
    old2 = spark.createDataFrame([(9, "x", 1)], ["k", "s", "v"])
    new2 = spark.createDataFrame([(9, "y", 2)], ["k", "s", "v"])
    r = table_diff(old2, new2, ["k"]).collect()[0]
    assert (r.change, list(r.changed_cols)) == ("changed", ["s", "v"])


def test_table_diff_compare_subset(spark):
    old, new = _frames(spark)
    # comparing only "v": row 2's s-change is invisible
    rows = {r.k: r.change
            for r in table_diff(old, new, ["k"],
                                compare_cols=["v"]).collect()}
    assert 2 not in rows
    assert rows[4] == "changed"
