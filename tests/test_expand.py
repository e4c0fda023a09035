"""Fixpoint expansion: termination on depth, cycle, and exhaustion —
the recursive-archive-unpacking analog (S2/S3)."""

from pyspark.sql import functions as F

from surfactant_spark.operators.expand import iterative_expand


def test_expand_chain_terminates(spark):
    # each row k expands to k+1 until 5 (a nested-archive chain)
    seed = spark.createDataFrame([(0,)], ["k"])

    def expand(df):
        return df.where(F.col("k") < 5).select((F.col("k") + 1).alias("k"))

    out = sorted(r.k for r in iterative_expand(seed, expand, key="k").collect())
    assert out == [0, 1, 2, 3, 4, 5]


def test_expand_cycle_terminates(spark):
    # 0 → 1 → 2 → 0 cycle: seen-key anti-join must break it
    seed = spark.createDataFrame([(0,)], ["k"])

    def expand(df):
        return df.select(((F.col("k") + 1) % 3).alias("k"))

    out = sorted(r.k for r in iterative_expand(seed, expand, key="k").collect())
    assert out == [0, 1, 2]


def test_expand_depth_bound(spark):
    seed = spark.createDataFrame([(0,)], ["k"])

    def expand(df):
        return df.select((F.col("k") + 1).alias("k"))  # infinite chain

    out = iterative_expand(seed, expand, key="k", max_depth=3).collect()
    assert len(out) == 4  # seed + 3 rounds


def test_iterative_expand_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches to reliable checkpoints; result identical
    to the localCheckpoint default."""
    seed = spark.createDataFrame([(1,)], ["k"])

    def expand(f):
        from pyspark.sql import functions as F
        return f.select((F.col("k") * 2).alias("k")).where(F.col("k") <= 8)

    a = {r.k for r in iterative_expand(seed, expand, "k").collect()}
    b = {
        r.k
        for r in iterative_expand(
            seed, expand, "k", checkpoint_dir=str(tmp_path / "ckpt")
        ).collect()
    }
    assert a == b == {1, 2, 4, 8}
