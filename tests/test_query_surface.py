"""Driver-contract surface: entry() runs, every queries() entry has an
oracle, and a fast sample of query/oracle pairs hash-matches at
sf0.001 (the full sweep is tools/check_oracles.py at sf0.01)."""

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.check_oracles import TABLES, frame_hash

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.exists(SF), reason="driver testdata missing")

# fast representatives of each family
SAMPLE = [
    "stat_counts",
    "argmax_confidence",
    "broadcast_join_agg",
    "roots_antijoin",
    "fingerprint_dedup",
    "minhash_lsh",
    "token_count",
    "lang_id",
    "embed_topk",
    "cc_components",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["lang", "entity", "n_docs"]


def test_every_query_has_oracle():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, duck, name):
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(osql[name])
    ocols = [d[0] for d in res.description]
    orows = [tuple(r) for r in res.fetchall()]
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows)
    assert frame_hash(sdf.columns, srows) == frame_hash(ocols, orows)
