"""Dictionary compile rules — the prefilter-policy analog of
surfactant/utils/ahocorasick.py:133-172 (skip 1-char / >10-literal
patterns) and js_file.py:88-93 (invalid regexes logged + skipped)."""

from surfactant_spark.dictionary import (
    alias_edges,
    alternation_literals,
    compile_dictionary,
    literal_prefix,
)


def test_literal_prefix():
    assert literal_prefix(r"libalpha v(\d+)") == "libalpha v"
    assert literal_prefix(r"a(\d+)") == "a"
    assert literal_prefix(r"\d+") == ""
    assert literal_prefix(r"beta\.js") == "beta.js"


def test_alternation_literals():
    assert alternation_literals("(aa|bb|cc)") == ["aa", "bb", "cc"]
    assert alternation_literals("(aa|b+)") is None
    assert alternation_literals("plain") is None


def test_compile_skips_bad_rows():
    compiled = compile_dictionary()
    reasons = {k: why for (k, _p, why) in compiled.skipped}
    assert reasons["badshort"] == "literal-too-short"
    assert reasons["badwide"] == "too-many-literals"
    assert reasons["badregex"] == "invalid-regex"
    keys = {p.entity_key for p in compiled.patterns}
    assert not keys & {"badshort", "badwide", "badregex"}


def test_alternation_prefilter_used():
    rows = [("multi", "content", "(foo1|bar2)", None)]
    compiled = compile_dictionary(rows)
    assert compiled.patterns[0].prefilter == ("foo1", "bar2")


def test_alias_edges_from_hints_and_explicit():
    edges = alias_edges()
    assert ("libalpha", "alphalib") in edges
    assert ("alphalib", "alphacore") in edges
    # pairs deduped and no self-edges
    assert all(a != b for a, b in edges)
