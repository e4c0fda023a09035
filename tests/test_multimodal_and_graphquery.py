"""Multimodal plumbing (schema/batching real, codec stubbed) and the
find/stat/add query surface."""

import pytest
from pyspark.sql import functions as F

from surfactant_spark.operators.graphquery import (
    add_installpath,
    add_relationship,
    find_nodes,
    stat_counts,
    top_by_in_degree,
)
from surfactant_spark.operators.multimodal import (
    classify_media,
    extract_media_features,
    sniff_media_type,
    synth_media,
)
from surfactant_spark.schema import EDGES_SCHEMA, NODES_SCHEMA


def test_sniff_and_classify_agree(spark):
    media = synth_media(spark, 60)
    clf = classify_media(media)
    rows = clf.select("media_id", "media_type", "content").collect()
    for r in rows:
        assert r.media_type == sniff_media_type(bytes(r.content)), r.media_id
    kinds = {r.media_type for r in rows}
    assert kinds == {"image", "audio", "unknown"}


def test_media_features_deterministic(spark):
    media = synth_media(spark, 30)
    feats = extract_media_features(classify_media(media))
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 30
    r0 = rows["m000000"]  # PNG magic → image with dims
    assert r0.media_type == "image" and r0.width and r0.height
    assert len(r0.feature) == 8
    # audio rows have no dims
    r3 = rows["m000003"]  # RIFF
    assert r3.media_type == "audio" and r3.width is None
    # rerun identical
    again = {r.media_id: r for r in extract_media_features(classify_media(media)).collect()}
    assert again["m000000"].sha256 == r0.sha256
    assert list(again["m000000"].feature) == list(r0.feature)


def test_media_real_codec_path_guarded(spark):
    # compressed media with decode_stub=False hits the honest no-codec
    # boundary at execution time (raised inside the Arrow worker)
    with pytest.raises(Exception, match="codec"):
        extract_media_features(synth_media(spark, 1), decode_stub=False).collect()


@pytest.fixture()
def graph(spark):
    nodes = spark.createDataFrame(
        [
            ("p:a", "page", "S1", ["Page A"], ["http://x/a", "c/pref/a"], "en", {"v": "1"}),
            ("p:b", "page", "S2", ["Page B"], ["http://x/b"], "fr", {}),
            ("e:x", "entity", None, ["alpha", "alphalib"], [], "en", {"version": "2.0"}),
            ("h:h", "host", None, ["x"], [], "en", {}),
        ],
        NODES_SCHEMA,
    )
    edges = spark.createDataFrame(
        [
            ("p:a", "Uses", "e:x", "en"),
            ("p:b", "Uses", "e:x", "fr"),
            ("h:h", "Contains", "p:a", "en"),
            ("h:h", "Contains", "p:b", "fr"),
            ("p:a", "LinksTo", "p:b", "en"),
        ],
        EDGES_SCHEMA,
    )
    return nodes, edges


def test_find_nodes_predicates(spark, graph):
    nodes, _ = graph
    assert {r.canonical_id for r in find_nodes(nodes, node_type="page").collect()} == {"p:a", "p:b"}
    assert {r.canonical_id for r in find_nodes(nodes, name_contains="alphal").collect()} == {"e:x"}
    assert {r.canonical_id for r in find_nodes(nodes, url_contains="x/b").collect()} == {"p:b"}
    assert {r.canonical_id for r in find_nodes(nodes, attr_equals=("version", "2.0")).collect()} == {"e:x"}
    assert find_nodes(nodes, node_type="page", sha256="S2").count() == 1


def test_stat_counts(spark, graph):
    nodes, edges = graph
    rows = {r.node_type: r for r in stat_counts(nodes, edges).collect()}
    assert rows["page"].n_nodes == 2
    assert rows["entity"].total_in_edges == 2
    assert rows["host"].n_roots == 1  # host has no inbound edge


def test_top_by_in_degree(spark, graph):
    nodes, edges = graph
    rows = top_by_in_degree(nodes, edges, k=1).collect()
    by_lang = {r.lang: r.obj for r in rows}
    assert by_lang["en"] in {"e:x", "p:a"}  # deterministic tie-break: min obj
    assert by_lang["fr"] in {"e:x", "p:b"}


def test_cycle_nodes(spark):
    from surfactant_spark.operators.graphquery import cycle_nodes

    edges = spark.createDataFrame(
        [("a", "LinksTo", "b", None), ("b", "LinksTo", "c", None),
         ("c", "LinksTo", "a", None),  # 3-cycle
         ("c", "LinksTo", "d", None), ("d", "LinksTo", "e", None)],  # tail
        EDGES_SCHEMA,
    )
    got = {r.canonical_id for r in cycle_nodes(edges, max_hops=8).collect()}
    assert got == {"a", "b", "c"}


def test_add_relationship_dedups(spark, graph):
    _, edges = graph
    before = edges.count()
    e2 = add_relationship(edges, "p:a", "Uses", "e:x", "en")  # duplicate
    assert e2.count() == before
    e3 = add_relationship(edges, "p:b", "Uses", "e:NEW", "fr")
    assert e3.count() == before + 1


def test_add_installpath_rewrite(spark, graph):
    nodes, _ = graph
    out = add_installpath(nodes, "c/pref/", "/opt/app/")
    pa = [r for r in out.collect() if r.canonical_id == "p:a"][0]
    assert "/opt/app/a" in pa.urls and "c/pref/a" in pa.urls
