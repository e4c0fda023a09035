"""JSON/CSV export + JSON/CSV round-trips (S4/S5/S6 analogs)."""

from surfactant_spark.schema import EDGES_SCHEMA, NODES_SCHEMA
from surfactant_spark.sources.readers import read_graph_csv, read_graph_json
from surfactant_spark.sources.sinks import nodes_to_csv_rows, write_graph_csv, write_graph_json


def _graph(spark):
    nodes = spark.createDataFrame(
        [
            ("p:a", "page", "S1", ["Page A"], ["u1", "u2"], "en", {"version": "1.0"}),
            ("e:x", "entity", None, ["alpha"], [], "fr", {}),
        ],
        NODES_SCHEMA,
    )
    edges = spark.createDataFrame([("p:a", "Uses", "e:x", "en")], EDGES_SCHEMA)
    return nodes, edges


def test_json_round_trip(spark, tmp_path):
    nodes, edges = _graph(spark)
    out = str(tmp_path / "graph")
    write_graph_json(nodes, edges, out)
    n2, e2 = read_graph_json(spark, out)
    assert {r.canonical_id for r in n2.collect()} == {"p:a", "e:x"}
    got = n2.where("canonical_id = 'p:a'").collect()[0]
    assert list(got.urls) == ["u1", "u2"] and got.attrs["version"] == "1.0"
    assert [tuple(r)[:3] for r in e2.collect()] == [("p:a", "Uses", "e:x")]


def test_csv_flattening(spark, tmp_path):
    nodes, _ = _graph(spark)
    rows = nodes_to_csv_rows(nodes).collect()
    # page exploded per url; entity (no urls) kept via explode_outer
    assert len(rows) == 3
    urls = sorted(r.url for r in rows if r.id == "p:a")
    assert urls == ["u1", "u2"]
    ent = [r for r in rows if r.id == "e:x"][0]
    assert ent.url is None and ent.name == "alpha"
    write_graph_csv(nodes, str(tmp_path / "csv"))  # smoke: writes without error


def test_csv_round_trip_fixed_point(spark, tmp_path):
    """write → read → write is a fixed point at the CSV-row level
    (the reference's read-back-what-you-wrote contract)."""
    nodes, _ = _graph(spark)
    out1, out2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    write_graph_csv(nodes, out1)
    n2 = read_graph_csv(spark, out1)
    got = {r.canonical_id: r for r in n2.collect()}
    assert set(got) == {"p:a", "e:x"}
    assert list(got["p:a"].urls) == ["u1", "u2"]
    assert got["p:a"].attrs["version"] == "1.0"
    assert list(got["e:x"].names) == ["alpha"]
    write_graph_csv(n2, out2)

    def norm(df):
        return {
            (r.canonical_id, r.node_type, tuple(r.names), tuple(r.urls),
             r.lang, tuple(sorted(r.attrs.items())))
            for r in df.collect()
        }

    assert norm(read_graph_csv(spark, out1)) == norm(read_graph_csv(spark, out2))
