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
    assert compiled.patterns[0].prefilter == ("bar2", "foo1")  # sorted set


def test_sre_literal_extraction_cases():
    """The sre-tree extractor finds sound prefilter literals where the
    prefix/alternation-only extractors gave up — semantics parity with
    the reference's regex.py extractor + ahocorasick.py skip policy."""
    from surfactant_spark.dictionary import required_literals

    import re

    cases = {
        r"(?:lib)?foo\d": ("foo",),           # optional prefix
        r"(ab|cd)ef": ("abef", "cdef"),       # alternation × suffix
        r"x(?=yy)zw": ("xzw",),               # lookahead is zero-width
        r"^\bhello\b$": ("hello",),           # anchors are zero-width
        r"a{3}b": ("aaab",),                  # exact repeat inlined
        r"(ab){2,}c": ("abab",),              # min-repeat inlined once
        r"libx\s+v(\d+)": ("libx",),          # run broken by \s
        r"a(\d+)": None,                      # 1-char literal → skip
        r"(x|)ab": ("ab", "xab"),             # empty alt absorbed
        r"\d+\.\d+": None,                    # no ≥2-char literal
    }
    for pat, exp in cases.items():
        got, why = required_literals(pat)
        assert got == exp, (pat, got, why)
        if got is not None:
            # soundness: every match of the regex contains ≥1 literal
            rx = re.compile(pat)
            for probe in ("libfoo7", "foo1", "abef x", "cdef", "xzwyy",
                          "hello", "aaab", "ababab c", "libx  v22", "xab"):
                m = rx.search(probe)
                if m:
                    assert any(l in probe.lower() for l in got), (pat, probe)


def test_alias_edges_from_hints_and_explicit():
    edges = alias_edges()
    assert ("libalpha", "alphalib") in edges
    assert ("alphalib", "alphacore") in edges
    # pairs deduped and no self-edges
    assert all(a != b for a, b in edges)


def test_version_placeholder_rewrite_retirejs_shape():
    """A RetireJS-shaped row with the §§version§§ placeholder compiles
    to the version-number regex (reference js_file.py:79-95) and — with
    DB-side capture parens — surfaces the matched version via group(1),
    with a usable literal prefilter derived from the rewritten form."""
    from surfactant_spark.dictionary import compile_dictionary

    rows = [
        ("jquery", "content", r"/\*!? jQuery v(§§version§§)", None),
        ("bad", "content", r"broken[(§§version§§", None),  # invalid after rewrite
    ]
    d = compile_dictionary(rows)
    assert [p.entity_key for p in d.patterns] == ["jquery"]
    assert ("bad", r"broken[(\d+(?:\.\d+)*", "invalid-regex") in [
        (k, p, w) for k, p, w in d.skipped
    ]
    p = d.patterns[0]
    assert "§§" not in p.pattern
    m = p.rx.search("/*! jQuery v3.6.0 | (c) JS Foundation")
    assert m and m.group(1) == "3.6.0"
    assert any("jquery" in lit for lit in p.prefilter)
