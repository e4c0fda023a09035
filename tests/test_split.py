"""Dedup-aware splitting (sampling.group_aware_split): group members
never straddle splits; naive per-doc hashing demonstrably leaks."""

from __future__ import annotations

import pyspark.sql.functions as F

from surfactant_spark.operators.dedup import lsh_dup_groups
from surfactant_spark.operators.sampling import group_aware_split, sample_key


def _near_dup_docs(spark):
    # families must NOT share vocabulary: docs sharing a large common
    # base all collapse into ONE LSH group (correct operator behavior,
    # wrong fixture — see SCALING.md's planted-family note)
    rows = []
    for fam in range(10):
        stem = " ".join(f"f{fam}w{i * 31 % 157}" for i in range(120))
        for v in range(4):  # 4 near-identical variants per family
            rows.append((fam * 10 + v, f"{stem} variant{v}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_group_split_has_zero_leak_pairs(spark):
    docs = _near_dup_docs(spark)
    grp = lsh_dup_groups(docs, k=8, bands=4)
    out = group_aware_split(grp, "group_id")
    # every group maps to exactly one split
    per_group = out.groupBy("group_id").agg(
        F.countDistinct("split").alias("ns")
    )
    assert per_group.where(F.col("ns") > 1).count() == 0
    # and therefore no near-dup pair crosses a split boundary
    a, b = out.alias("a"), out.alias("b")
    leaks = (
        a.join(b, F.col("a.group_id") == F.col("b.group_id"))
        .where(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.split") != F.col("b.split"))
        )
        .count()
    )
    assert leaks == 0


def test_naive_doc_split_leaks_on_same_corpus(spark):
    """Control: hashing the DOC id splits near-dup families apart."""
    docs = _near_dup_docs(spark)
    grp = lsh_dup_groups(docs, k=8, bands=4)
    naive = grp.withColumn(
        "split",
        F.when(sample_key(F.col("doc_id"), "split0") % 10 < 8, "train")
        .otherwise("test"),
    )
    a, b = naive.alias("a"), naive.alias("b")
    leaks = (
        a.join(b, F.col("a.group_id") == F.col("b.group_id"))
        .where(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.split") != F.col("b.split"))
        )
        .count()
    )
    assert leaks > 0


def test_split_weights_and_determinism(spark):
    docs = _near_dup_docs(spark)
    grp = lsh_dup_groups(docs, k=8, bands=4)
    out1 = {
        (r.doc_id, r.split)
        for r in group_aware_split(grp, "group_id").collect()
    }
    out2 = {
        (r.doc_id, r.split)
        for r in group_aware_split(grp, "group_id").collect()
    }
    assert out1 == out2  # replayable
    names = {s for _, s in out1}
    assert names <= {"train", "val", "test"} and "train" in names
