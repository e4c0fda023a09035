"""Unit tests for context-overlap entity disambiguation and
integer-exact frecency scoring."""

import datetime as dt

from surfactant_spark.operators.entityres import disambiguate_by_context
from surfactant_spark.operators.temporal import frecency_scores


def _frames(spark):
    cands = spark.createDataFrame(
        [("spark", "ent_engine"), ("spark", "ent_plug")], ["term", "entity"]
    )
    profs = spark.createDataFrame(
        [("ent_engine", "query"), ("ent_engine", "join"),
         ("ent_plug", "ignition"), ("ent_plug", "car")],
        ["entity", "ptok"],
    )
    return cands, profs


def test_disambig_picks_higher_overlap(spark):
    cands, profs = _frames(spark)
    docs = spark.createDataFrame(
        [(1, "spark query join performance"),
         (2, "spark ignition car repair")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: (r.entity, r.overlap)
           for r in disambiguate_by_context(docs, cands, profs).collect()}
    assert got[1] == ("ent_engine", 2)
    assert got[2] == ("ent_plug", 2)


def test_disambig_tie_breaks_lexicographic(spark):
    cands, profs = _frames(spark)
    # no profile tokens present: both candidates overlap 0 -> min id
    docs = spark.createDataFrame([(1, "spark alone")], ["doc_id", "text"])
    rows = disambiguate_by_context(docs, cands, profs).collect()
    assert len(rows) == 1
    assert rows[0].entity == "ent_engine" and rows[0].overlap == 0


def test_disambig_no_mention_no_row(spark):
    cands, profs = _frames(spark)
    docs = spark.createDataFrame([(1, "nothing relevant")], ["doc_id", "text"])
    assert disambiguate_by_context(docs, cands, profs).count() == 0


def test_frecency_decay_staircase(spark):
    ts = lambda s: dt.datetime.fromisoformat(s)
    events = spark.createDataFrame(
        [(1, ts("2024-02-28T12:00:00")),   # age 2d  -> bucket 0 -> 1e6
         (1, ts("2024-02-10T00:00:00")),   # age 19d -> bucket 2 -> 250000
         (2, ts("2024-03-05T00:00:00")),   # future  -> 0
         (2, ts("2023-01-01T00:00:00"))],  # age 425d -> bucket 30 capped
        ["user_id", "ts"],
    )
    got = {r.user: (r.n_events, r.frecency)
           for r in frecency_scores(events, ref_date="2024-03-01").collect()}
    assert got[1] == (2, 1_250_000)
    assert got[2] == (2, 1_000_000 >> 30)   # 0 from future + capped tail
