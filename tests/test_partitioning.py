"""spread() — the scan-width guard for compute-heavy projections.

Contract: identical rows, wider physical parallelism only when the
input plan is narrower than the session's compute width, and a
guaranteed no-op (no added exchange) when the input is already at or
above that width.
"""

import pytest
from pyspark.sql import functions as F

from surfactant_spark.partitioning import compute_width, spread


@pytest.fixture(scope="module")
def spark():
    from surfactant_spark.session import get_spark

    s = get_spark(app_name="test_partitioning", cores=4, shuffle_partitions=4)
    yield s


def test_spread_widens_narrow_frame(spark):
    df = spark.range(1000).coalesce(1).select(F.col("id"))
    out = spread(df, "id")
    assert out.rdd.getNumPartitions() == compute_width(df)
    assert sorted(r.id for r in out.collect()) == list(range(1000))


def test_spread_noop_when_already_wide(spark):
    w = compute_width(spark.range(10))
    df = spark.range(1000).repartition(w + 2, "id")
    out = spread(df, "id")
    # no extra exchange: the returned frame IS the input
    assert out is df


def test_spread_keyless_round_robin(spark):
    df = spark.range(257).coalesce(1)
    out = spread(df)
    assert out.rdd.getNumPartitions() == compute_width(df)
    assert out.count() == 257


def test_bcubed_empty_frame(spark):
    """The r7 single-pass bcubed rewrite must keep the empty-input
    contract of the old shape: n_items == 0, null scores."""
    from surfactant_spark.operators.dedup import bcubed_scores

    df = spark.createDataFrame(
        [], "doc_id string, pred string, truth string"
    )
    (row,) = bcubed_scores(df).collect()
    assert row["n_items"] == 0
    assert row["b3_precision_x1e6"] is None
    assert row["b3_f1_x1e6"] is None
