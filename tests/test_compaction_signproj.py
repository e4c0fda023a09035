"""Catalog small-file compaction (rewrite_data_files analog) and the
integer-exact sign projection."""

import glob
import os

from pyspark.sql import functions as F

from surfactant_spark.operators.similarity import sign_matrix, sign_project
from surfactant_spark.plans.catalog import SnapshotCatalog


def _part_files(path: str) -> list[str]:
    return glob.glob(os.path.join(path, "**", "part-*"), recursive=True)


def test_compact_folds_append_chain(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    base = spark.range(0, 800).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    )
    cat.write(base.repartition(16), "t", "fp-1")
    delta = spark.range(800, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("grp")
    )
    cat.write(delta.repartition(16), "t", "fp-1", mode="append")
    ent = cat.snapshot_info("t")
    assert len(ent["paths"]) == 2
    files_before = sum(len(_part_files(p)) for p in ent["paths"])
    assert files_before >= 32

    before = sorted(map(tuple, cat.read(spark, "t").collect()))
    pre_snap = ent["snapshot"]
    cat.compact_table(spark, "t", target_files=2)

    ent2 = cat.snapshot_info("t")
    # single root, far fewer files, same fingerprint (resume unaffected)
    assert len(ent2["paths"]) == 1
    assert len(_part_files(ent2["paths"][0])) == 2
    assert ent2["fingerprint"] == "fp-1"
    assert cat.has("t", "fp-1")
    after = sorted(map(tuple, cat.read(spark, "t").collect()))
    assert after == before

    # pre-compaction snapshot stays time-travelable until expired
    tt = sorted(map(tuple, cat.read(spark, "t", snapshot=pre_snap).collect()))
    assert tt == before
    removed = cat.expire_snapshots("t", keep_last=1)
    assert removed  # old snapshot dirs reclaimed
    assert sorted(map(tuple, cat.read(spark, "t").collect())) == before


def test_compact_auto_sizing(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path / "cat2"))
    cat.write(spark.range(0, 500).repartition(10), "u", "fp")
    cat.compact_table(spark, "u", rows_per_file=200)  # ceil(500/200) = 3
    assert len(_part_files(cat.snapshot_info("u")["paths"][0])) == 3


def test_sign_matrix_deterministic():
    a = sign_matrix(16, 4)
    b = sign_matrix(16, 4)
    assert a == b
    assert all(s in (1, -1) for row in a for s in row)
    # seeded differently -> different matrix
    assert sign_matrix(16, 4, seed="other") != a


def test_sign_project_hand_computed(spark):
    # dim=2, out_dims=2: p_j = round(v0*10000)*s_j0 + round(v1*10000)*s_j1
    mat = sign_matrix(2, 2)
    df = spark.createDataFrame([(1, [0.5, -0.25])], ["vec_id", "embedding"])
    row = sign_project(df, "embedding", dim=2, out_dims=2).collect()[0]
    for j in (0, 1):
        want = 5000 * mat[j][0] + (-2500) * mat[j][1]
        assert row[f"p{j}"] == want


def test_sign_project_partition_invariant(spark):
    df = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 8), i -> "
            "CAST(pmod(id * 31 + i * 7, 97) AS FLOAT) / 97.0)"
        ).alias("embedding"),
    )
    one = sorted(
        map(tuple, sign_project(df, dim=8, out_dims=4).collect())
    )
    two = sorted(
        map(
            tuple,
            sign_project(df.repartition(13), dim=8, out_dims=4).collect(),
        )
    )
    assert one == two and len(one) == 300
