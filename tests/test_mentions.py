"""Mention detection semantics: first-match-wins per entity + version
capture — the translated js_file.py:112-149 behavior test."""

from surfactant_spark.dictionary import compile_dictionary
from surfactant_spark.operators.mentions import detect_mentions
from surfactant_spark.oracle.pyoracle import detect_mentions_text


ROWS = [
    ("libx", "content", r"libx v(\d+(?:\.\d+)*)", None),
    ("libx", "name", "libx", None),
    ("liby", "name", "lib-y", None),
]


def _mk_content_df(spark, texts):
    return spark.createDataFrame(
        [(f"sha{i}", "en", t) for i, t in enumerate(texts)],
        ["content_sha256", "lang", "text"],
    )


def test_first_match_wins_version_capture(spark):
    compiled = compile_dictionary(ROWS)
    texts = [
        "we use libx v1.2.3 here",        # content pattern wins → version
        "plain libx mention",              # name fallback, no version
        "nothing to see",                  # no match
        "LIB-Y and libx v9.9",            # case-insensitive name + content
        "sublibx embedded",                # token boundary → no match
    ]
    df = detect_mentions(_mk_content_df(spark, texts), compiled)
    got = {(r.content_sha256, r.entity_key, r.version, r.matched_via) for r in df.collect()}
    assert got == {
        ("sha0", "libx", "1.2.3", "content"),
        ("sha1", "libx", None, "name"),
        ("sha3", "liby", None, "name"),
        ("sha3", "libx", "9.9", "content"),
    }


def test_windowed_ac_confirm_on_long_text(spark):
    """The AC path confirms the regex only inside ±(50, 4096)-char
    windows around candidate literal positions (the reference's
    native_lib_file.py:246-270 windowing).  A literal occurrence whose
    window does NOT contain a full regex match must not suppress a
    later occurrence whose window does."""
    compiled = compile_dictionary([("libx", "content", r"libx\s+v(\d+)", None)])
    filler = " ".join(["filler"] * 900)  # ≈ 6,300 chars > WINDOW_AFTER
    texts = [
        # bare 'libx' at pos 0 (its window has no version), true match
        # only after the >4096-char gap
        "libx alone " + filler + " libx v7 end",
        # no true match anywhere despite two candidate literals
        "libx start " + filler + " libx end",
    ]
    df = detect_mentions(_mk_content_df(spark, texts), compiled, ac_threshold=0)
    got = {(r.content_sha256, r.entity_key, r.version) for r in df.collect()}
    assert got == {("sha0", "libx", "7")}


def test_spark_matches_oracle_detector(spark):
    compiled = compile_dictionary()
    texts = [
        "site uses libalpha v2.4.11 today and beta.js",
        "alpha-lib with gammasql 3.1",
        "eta-q deltadb zetacache thetanet 1.0",
        "ALPHALIB shouting",
    ]
    df = detect_mentions(_mk_content_df(spark, texts), compiled)
    got = {(r.content_sha256, r.entity_key, r.version) for r in df.collect()}
    exp = set()
    for i, t in enumerate(texts):
        for ent, ver, _c, _k in detect_mentions_text(t, compiled):
            exp.add((f"sha{i}", ent, ver))
    assert got == exp and len(exp) >= 8


def test_large_dictionary_broadcast_path(spark):
    """A production-size dictionary (> BROADCAST_THRESHOLD patterns)
    ships via sparkContext.broadcast and the worker-side automaton memo;
    planted mentions are still found exactly (parity with the
    closure-shipped path on the same corpus)."""
    from surfactant_spark.dictionary import compile_dictionary, synth_dictionary_rows
    from surfactant_spark.operators.mentions import detect_mentions

    rows = synth_dictionary_rows(600, version_rows=False)  # 600 > 512
    compiled = compile_dictionary(rows)
    assert len(compiled.patterns) == 600
    planted = [rows[i][0] for i in (0, 17, 599)]
    content = spark.createDataFrame(
        [(f"c{i}", "en", f"this page uses {k} extensively")
         for i, k in enumerate(planted)] + [("c9", "en", "no mentions here")],
        "content_sha256 string, lang string, text string",
    )
    got = detect_mentions(content, compiled).collect()
    assert {(r.content_sha256, r.entity_key) for r in got} == {
        (f"c{i}", k) for i, k in enumerate(planted)
    }
    # parity with the closure path (broadcast disabled)
    got2 = detect_mentions(content, compiled, broadcast_threshold=10**9).collect()
    assert {(r.content_sha256, r.entity_key, r.confidence) for r in got2} == {
        (r.content_sha256, r.entity_key, r.confidence) for r in got
    }
