"""Blocked Levenshtein entity resolution fixtures."""

from surfactant_spark.operators.entityres import match_names


def test_match_names_basic(spark):
    left = spark.createDataFrame(
        [("OpenSSL",), ("zlib",), ("libpng",), ("x",)], ["name"]
    )
    right = spark.createDataFrame(
        [("openssl1",), ("openssl",), ("zlb",), ("totally-other",)],
        ["name"],
    )
    rows = {(r.name_l, r.name_r, r.dist) for r in
            match_names(left, right, max_dist=2).collect()}
    # one insert away, shares the prefix block (case-normalized)
    assert ("openssl", "openssl1", 1) in rows
    # deletion typo: prefix block 'zl' still shared
    assert ("zlib", "zlb", 1) in rows
    # exact equals are excluded — they need no resolution
    assert not [r for r in rows if r[0] == r[1]]
    # distance bound respected
    assert all(d <= 2 for _, _, d in rows)


def test_match_names_suffix_block_recovers_prefix_typo(spark):
    # first-char typo breaks the prefix block; the suffix pass finds it
    left = spark.createDataFrame([("curl",)], ["name"])
    right = spark.createDataFrame([("burl",)], ["name"])
    rows = match_names(left, right, max_dist=1).collect()
    assert [(r.name_l, r.name_r, r.dist) for r in rows] == [
        ("curl", "burl", 1)
    ]


def test_match_names_documented_blocking_miss(spark):
    # rewrites at BOTH ends share neither block: documented miss
    left = spark.createDataFrame([("axxxb",)], ["name"])
    right = spark.createDataFrame([("cxxxd",)], ["name"])
    assert match_names(left, right, max_dist=2).count() == 0


def test_match_names_length_guard_and_empty(spark):
    left = spark.createDataFrame([("ab",), ("",), ("  ",)], ["name"])
    right = spark.createDataFrame([("abcdef",)], ["name"])
    # length differs by 4 > max_dist: pruned before any Levenshtein
    assert match_names(left, right, max_dist=2).count() == 0
