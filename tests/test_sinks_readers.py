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


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key by the same bucket count
    must join with NO shuffle Exchange in the physical plan — the
    co-located layout the north rule requires for nodes/edges."""
    from pyspark.sql import functions as F

    from surfactant_spark.sources.sinks import write_bucketed_table

    nodes = spark.range(0, 2000).select(
        F.concat(F.lit("p:"), F.md5(F.col("id").cast("string"))).alias("canonical_id"),
        (F.col("id") % 7).alias("grp"),
    )
    edges = spark.range(0, 6000).select(
        F.concat(F.lit("p:"), F.md5((F.col("id") % 2000).cast("string"))).alias("subj"),
        F.lit("Uses").alias("pred"),
    )
    write_bucketed_table(nodes, "t_nodes_b", "canonical_id", 8,
                         path=str(tmp_path / "nodes_b"))
    write_bucketed_table(edges, "t_edges_b", "subj", 8,
                         path=str(tmp_path / "edges_b"))
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        n = spark.table("t_nodes_b")
        e = spark.table("t_edges_b")
        joined = n.join(e, n["canonical_id"] == e["subj"]).groupBy("grp").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the ONLY exchange allowed is the final groupBy('grp'); the
        # join itself must read co-located buckets
        join_part = plan.split("SortMergeJoin", 1)[-1]
        assert "Exchange" not in join_part, join_part[:2000]
        assert joined.count() == 7
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.sql("DROP TABLE IF EXISTS t_nodes_b")
        spark.sql("DROP TABLE IF EXISTS t_edges_b")


def test_cyclonedx_export_shape(spark, tmp_path):
    import json

    from surfactant_spark.sources.sinks import write_cyclonedx_json

    nodes, edges = _graph(spark)
    out = str(tmp_path / "bom.cdx.json")
    write_cyclonedx_json(nodes, edges, out)
    doc = json.load(open(out))
    assert doc["bomFormat"] == "CycloneDX" and doc["specVersion"] == "1.5"
    comps = {c["bom-ref"]: c for c in doc["components"]}
    assert comps["p:a"]["hashes"] == [{"alg": "SHA-256", "content": "S1"}]
    assert comps["p:a"]["version"] == "1.0" and comps["p:a"]["name"] == "Page A"
    assert comps["e:x"]["type"] == "library" and "hashes" not in comps["e:x"]
    assert doc["dependencies"] == [{"ref": "p:a", "dependsOn": ["e:x"]}]


def test_spdx_export_shape(spark, tmp_path):
    import json

    from surfactant_spark.sources.sinks import write_spdx_json

    nodes, edges = _graph(spark)
    out = str(tmp_path / "doc.spdx.json")
    write_spdx_json(nodes, edges, out)
    doc = json.load(open(out))
    assert doc["spdxVersion"] == "SPDX-2.3" and doc["SPDXID"] == "SPDXRef-DOCUMENT"
    pkgs = {p["SPDXID"]: p for p in doc["packages"]}
    assert pkgs["SPDXRef-p-a"]["checksums"][0]["checksumValue"] == "S1"
    assert pkgs["SPDXRef-e-x"]["name"] == "alpha"
    assert doc["relationships"] == [{
        "spdxElementId": "SPDXRef-p-a",
        "relationshipType": "DEPENDS_ON",
        "relatedSpdxElement": "SPDXRef-e-x",
    }]


def test_spdx_doc_name_escaped(spark, tmp_path):
    """doc_name with quotes/backslashes must still yield valid JSON
    (r4 ADVICE: raw f-string interpolation broke the envelope)."""
    import json

    from surfactant_spark.sources.sinks import write_spdx_json

    nodes, edges = _graph(spark)
    out = str(tmp_path / "weird.spdx.json")
    write_spdx_json(nodes, edges, out, doc_name='my "graph" \\ v1')
    doc = json.load(open(out))  # would raise on invalid JSON
    assert doc["name"] == 'my "graph" \\ v1'


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


def test_standards_export_empty_graph(spark, tmp_path):
    """Zero nodes/edges must still yield a valid single document with
    empty arrays (the distributed shard concat has no first element)."""
    import json

    from surfactant_spark.sources.sinks import write_cyclonedx_json, write_spdx_json

    nodes = spark.createDataFrame([], NODES_SCHEMA)
    edges = spark.createDataFrame([], EDGES_SCHEMA)
    cdx, spdx = str(tmp_path / "e.cdx.json"), str(tmp_path / "e.spdx.json")
    write_cyclonedx_json(nodes, edges, cdx)
    write_spdx_json(nodes, edges, spdx)
    d1, d2 = json.load(open(cdx)), json.load(open(spdx))
    assert d1["components"] == [] and d1["dependencies"] == []
    assert d2["packages"] == [] and d2["relationships"] == []
