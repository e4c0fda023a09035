"""JSON-LD flattener + sitemap parser fixtures."""

from surfactant_spark.operators.crawl import parse_sitemap_entries
from surfactant_spark.operators.structdata import (
    extract_jsonld,
    flatten_jsonld,
)


def test_flatten_scalars_and_nested():
    t = flatten_jsonld(
        '{"@type":"Person","name":"Ada","age":36,"ok":true,'
        '"x":null,"pi":2.5,"whole":3.0}'
    )
    assert ("", False, "name", "Ada", "lit") in t
    assert ("", False, "age", "36", "lit") in t
    assert ("", False, "ok", "true", "lit") in t
    assert ("", False, "pi", "2.5", "lit") in t
    # float-typed whole numbers print as ints (JSON 3.0 == 3)
    assert ("", False, "whole", "3", "lit") in t
    # nulls contribute no triple
    assert not [x for x in t if x[2] == "x"]


def test_flatten_id_and_lists():
    t = flatten_jsonld(
        '{"@id":"urn:a","knows":[{"@id":"urn:b"},{"name":"C"}],'
        '"tags":["x","y"]}'
    )
    # absolute subject from @id; list children keep their index path
    assert ("urn:a", True, "knows", "urn:b", "abs") in t
    assert ("urn:a", True, "knows", "/knows/1", "rel") in t
    assert ("/knows/1", False, "name", "C", "lit") in t
    assert ("urn:a", True, "tags", "x", "lit") in t
    assert ("urn:a", True, "tags", "y", "lit") in t
    # @id itself emits no triple
    assert not [x for x in t if x[2] == "@id"]


def test_flatten_top_level_array_and_malformed():
    t = flatten_jsonld('[{"a":"1"},{"a":"2"}]')
    assert ("/0", False, "a", "1", "lit") in t
    assert ("/1", False, "a", "2", "lit") in t
    assert flatten_jsonld("{not json") == []
    assert flatten_jsonld('"just a string"') == []
    # nested array-of-arrays has no RDF analog: skipped, no crash
    assert flatten_jsonld('{"m":[[1,2]],"k":"v"}') == [
        ("", False, "k", "v", "lit")
    ]


def test_extract_jsonld_end_to_end(spark):
    html = (
        "<html><head>"
        "<script type='application/ld+json'>"
        '{"@type":"Product","name":"Widget",'
        '"brand":{"@type":"Brand","name":"Acme"}}'
        "</script>"
        "<script>var x = 1;</script>"
        '<script type="application/ld+json">{"@id":"urn:p2","sku":"9"}'
        "</script></head><body></body></html>"
    )
    pages = spark.createDataFrame(
        [("http://a.com/p", html), ("http://b.com/q", html)],
        ["url", "html"],
    )
    rows = {tuple(r) for r in extract_jsonld(pages).collect()}
    # block 0: relative root + relative nested brand node
    assert ("http://a.com/p", "http://a.com/p#b0", "name", "Widget") in rows
    assert (
        "http://a.com/p",
        "http://a.com/p#b0",
        "brand",
        "http://a.com/p#b0/brand",
    ) in rows
    assert (
        "http://a.com/p",
        "http://a.com/p#b0/brand",
        "name",
        "Acme",
    ) in rows
    # block 1: @id subject is absolute — shared across both pages
    assert ("http://a.com/p", "urn:p2", "sku", "9") in rows
    assert ("http://b.com/q", "urn:p2", "sku", "9") in rows
    # the plain <script> block contributed nothing
    assert not [r for r in rows if "var x" in r[3]]
    # template-dup pages: same triple count per url
    per_url = {}
    for r in rows:
        per_url[r[0]] = per_url.get(r[0], 0) + 1
    assert per_url["http://a.com/p"] == per_url["http://b.com/q"]


SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://x.com/a</loc>
    <lastmod>2024-01-02</lastmod>
    <changefreq>daily</changefreq>
  </url>
  <url><loc>
      http://x.com/b
  </loc></url>
  <url><lastmod>2024-05-05</lastmod></url>
</urlset>"""

SITEMAP_INDEX = """<?xml version="1.0"?>
<sitemapindex>
  <sitemap><loc>http://x.com/s1.xml</loc><lastmod>2024-03-04</lastmod>
  </sitemap>
  <sitemap><loc>http://x.com/s2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_sitemap_entries(spark):
    docs = spark.createDataFrame(
        [("u", SITEMAP), ("i", SITEMAP_INDEX)], ["src", "xml"]
    )
    rows = {tuple(r) for r in parse_sitemap_entries(docs).collect()}
    assert ("u", "page", "http://x.com/a", "2024-01-02") in rows
    # whitespace-padded loc is trimmed; missing lastmod → NULL
    assert ("u", "page", "http://x.com/b", None) in rows
    assert ("i", "sitemap", "http://x.com/s1.xml", "2024-03-04") in rows
    assert ("i", "sitemap", "http://x.com/s2.xml", None) in rows
    # the loc-less <url> entry is dropped
    assert len(rows) == 4
