"""HTML microdata extraction (structdata.parse_microdata /
extract_microdata) and PMI collocations (indexing.pmi_collocations)."""

from __future__ import annotations

from surfactant_spark.operators.structdata import parse_microdata


def test_microdata_nested_item_and_values():
    html = (
        '<div itemscope itemtype="https://schema.org/Product" itemid="urn:p:1">'
        '<span itemprop="name">Widget <b>Pro</b></span>'
        '<meta itemprop="sku" content="42">'
        '<a itemprop="url" href="/p/42">link</a>'
        '<div itemprop="brand" itemscope itemtype="https://schema.org/Brand">'
        '<span itemprop="name">Acme</span></div></div>'
    )
    got = set(parse_microdata(html))
    assert got == {
        ("urn:p:1", "type", "https://schema.org/Product"),
        ("urn:p:1", "name", "Widget Pro"),
        ("urn:p:1", "sku", "42"),
        ("urn:p:1", "url", "/p/42"),
        ("urn:p:1", "brand", "#m1"),
        ("#m1", "type", "https://schema.org/Brand"),
        ("#m1", "name", "Acme"),
    }


def test_microdata_multiple_items_and_blank_ids():
    html = (
        '<section><p itemscope itemtype="T1"><span itemprop="a">x</span></p>'
        '<p itemscope><span itemprop="a">y</span></p></section>'
    )
    got = set(parse_microdata(html))
    assert got == {("#m0", "type", "T1"), ("#m0", "a", "x"), ("#m1", "a", "y")}


def test_microdata_degenerate_markup():
    # no items → no triples; itemprop outside any itemscope → dropped;
    # unclosed capture at EOF still emits its buffered text
    assert parse_microdata("<p>plain</p>") == []
    assert parse_microdata('<span itemprop="x">orphan</span>') == []
    got = parse_microdata(
        '<div itemscope><span itemprop="x">trailing'
    )
    assert got == [("#m0", "x", "trailing")]
    assert parse_microdata("") == []


def test_microdata_whitespace_normalization_and_img():
    html = (
        '<div itemscope>'
        '<p itemprop="desc">  a\n  b\t c  </p>'
        '<img itemprop="image" src="/i.png">'
        "</div>"
    )
    got = set(parse_microdata(html))
    assert got == {("#m0", "desc", "a b c"), ("#m0", "image", "/i.png")}


def test_pmi_prefers_exclusive_pairs(spark):
    """A pair that always co-occurs and appears nowhere else outranks a
    pair diluted across many docs."""
    from surfactant_spark.operators.indexing import pmi_collocations

    docs = [(i, "zet yul filler%d" % i) for i in range(5)]  # zet+yul exclusive
    docs += [(10 + i, "common alpha w%d" % i) for i in range(5)]
    docs += [(20 + i, "common beta v%d" % i) for i in range(5)]
    docs += [(30, "common alpha beta zz")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    top = pmi_collocations(df, min_count=3, k=3).collect()
    assert (top[0].term_a, top[0].term_b) == ("yul", "zet")
    # integer rank key: n_ab * 1e12 div (n_a * n_b)
    assert top[0].score_u == 5 * 10**12 // (5 * 5)
