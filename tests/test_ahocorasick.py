"""Aho-Corasick automaton + its integration into mention detection —
the tests/utils/test_ahocorasick.py analog (classic he/she/his/hers
failure-link cases), plus path equivalence: AC prefilter must yield
exactly the same mentions as the vectorized per-literal prefilter."""

from surfactant_spark.dictionary import compile_dictionary
from surfactant_spark.functions.ahocorasick import AhoCorasick
from surfactant_spark.operators.mentions import detect_mentions


def test_classic_failure_links():
    ac = AhoCorasick(["he", "she", "his", "hers"])
    assert ac.search_ids("ushers") == {0, 1, 3}  # he, she, hers overlap
    assert ac.search_ids("history") == {2}
    assert ac.search_ids("xyz") == set()


def test_overlapping_and_nested():
    ac = AhoCorasick(["ab", "abc", "bc", "c"])
    hits = ac.find_all("abc")
    got = {(pid, end) for pid, end in hits}
    assert got == {(0, 1), (2, 2), (1, 2), (3, 2)}


def test_case_insensitive_and_multi_id():
    ac = AhoCorasick({"foo": [7, 9], "bar": [1]})
    assert ac.search_ids("FOObar") == {7, 9, 1}


def test_empty_text_and_single_char():
    ac = AhoCorasick(["a"])
    assert ac.search_ids("") == set()
    assert ac.search_ids("bab") == {0}


def test_ac_path_equals_vectorized_path(spark):
    compiled = compile_dictionary()
    texts = [
        "site uses libalpha v2.4.11 today and beta.js",
        "alpha-lib with gammasql 3.1 and eta-q",
        "nothing here",
        "THETANET 9.1 and deltadb and zetacache",
        "sublibalpha not a token match but libalpha v1.0 is",
    ]
    df = spark.createDataFrame(
        [(f"s{i}", "en", t) for i, t in enumerate(texts)],
        ["content_sha256", "lang", "text"],
    )
    vec = {(r.content_sha256, r.entity_key, r.version, r.matched_via)
           for r in detect_mentions(df, compiled, ac_threshold=10_000).collect()}
    acp = {(r.content_sha256, r.entity_key, r.version, r.matched_via)
           for r in detect_mentions(df, compiled, ac_threshold=0).collect()}
    assert vec == acp and len(vec) >= 9
