"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query on /root/testdata/sf0.001
queries()    — one entry per implemented operator from SURVEY.md §2
               (plus the training-data pipeline ops)
oracle_sql() — matching DuckDB SQL per query

Implementations live in surfactant_spark/queries.py; this module is a
thin adapter so the engine package stays importable on its own.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from surfactant_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: mention detection + per-(lang, entity) doc counts."""
    return _q.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
