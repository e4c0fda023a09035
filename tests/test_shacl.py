"""SHACL-style validation (graphquery.shacl_validate) on a hand-built
KG where every violation is enumerable by eye."""

from __future__ import annotations

import pytest

from surfactant_spark.operators.graphquery import shacl_validate

TRIPLES = [
    ("a", "knows", "b"),
    ("a", "knows", "zombie"),   # range violation (zombie untyped)
    ("ghost", "knows", "b"),    # domain violation (ghost untyped)
    ("a", "hasName", "Alice"),
    ("a", "hasName", "Al"),     # maxcount(1) violation for a
    ("b", "hasName", "Bob"),
    ("a", "bornOn", "1990-01-02"),
    ("b", "bornOn", "90-1-2"),  # pattern violation
]
TYPES = [("a", "person"), ("b", "person"), ("c", "person")]
# c is a person with no hasName → mincount violation

SHAPES = [
    ("dom", "domain", "knows", "person"),
    ("rng", "range", "knows", "person"),
    ("max1", "maxcount", "hasName", 1),
    ("min1", "mincount", "person", "hasName"),
    ("pat", "pattern", "bornOn", "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
]


def test_shacl_all_violation_kinds(spark):
    t = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    ty = spark.createDataFrame(TYPES, "entity string, type string")
    got = {
        (r.shape_id, r.kind, r.focus)
        for r in shacl_validate(t, ty, SHAPES).collect()
    }
    assert got == {
        ("dom", "domain", "ghost"),
        ("rng", "range", "zombie"),
        ("max1", "maxcount", "a"),
        ("min1", "mincount", "c"),
        ("pat", "pattern", "b"),
    }


def test_shacl_clean_graph_empty_report(spark):
    t = spark.createDataFrame(
        [("a", "knows", "b"), ("a", "hasName", "Alice"), ("b", "hasName", "Bo")],
        "subj string, pred string, obj string",
    )
    ty = spark.createDataFrame(
        [("a", "person"), ("b", "person")], "entity string, type string"
    )
    assert shacl_validate(t, ty, SHAPES).count() == 0


def test_shacl_unknown_kind_raises(spark):
    t = spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")
    ty = spark.createDataFrame(TYPES, "entity string, type string")
    with pytest.raises(ValueError):
        shacl_validate(t, ty, [("x", "nonsense", "knows", "person")])
