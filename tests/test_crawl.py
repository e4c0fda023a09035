"""robots.txt parser (RFC 9309 subset) + matcher fixtures."""

from surfactant_spark.operators.crawl import (
    parse_robots_txt,
    robots_match,
    robots_rules_frame,
)

ROBOTS = """
# comment line
User-agent: googlebot
Disallow: /private
Allow: /private/ok

User-agent: *
Disallow: /tmp
Disallow:
Allow: /tmp/keep
Crawl-delay: 10
"""


def test_parse_robots_groups_and_agent_override():
    star = parse_robots_txt(ROBOTS, "*")
    assert star == [("/tmp", False), ("/tmp/keep", True)]
    # exact agent group wins over *
    gb = parse_robots_txt(ROBOTS, "GoogleBot")
    assert gb == [("/private", False), ("/private/ok", True)]
    # unknown agent falls back to *
    assert parse_robots_txt(ROBOTS, "other") == star
    # empty Disallow contributed no rule; comments ignored
    assert parse_robots_txt("# only comments\n", "*") == []


def test_robots_match_longest_wins_and_defaults(spark):
    rules = robots_rules_frame(
        spark, {"a.com": ROBOTS}, agent="*"
    ).withColumnRenamed("host", "host")
    urls = spark.createDataFrame(
        [
            (0, "http://a.com/tmp/x"),        # blocked by /tmp
            (1, "http://a.com/tmp/keep/y"),   # longest match /tmp/keep allows
            (2, "http://a.com/other"),        # no rule -> allow
            (3, "http://b.com/tmp/x"),        # host without rules -> allow
            (4, "http://a.com/tmp/x"),        # duplicate url keeps its row
        ],
        ["okey", "url"],
    )
    got = {r.okey: (r.allowed, r.rule) for r in robots_match(urls, rules).collect()}
    assert got == {
        0: (False, "/tmp"),
        1: (True, "/tmp/keep"),
        2: (True, ""),
        3: (True, ""),
        4: (False, "/tmp"),
    }
    assert robots_match(urls, rules).count() == 5


def test_resolve_redirects_chain_and_cycle(spark):
    from surfactant_spark.operators.crawl import resolve_redirects

    red = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "d"),   # chain -> d (terminal)
            ("x", "y"), ("y", "x"),               # 2-cycle
            ("w", "x"),                           # chain into the cycle
            ("a", "z"),                           # duplicate src: min(dst)='b'
        ],
        ["src", "dst"],
    )
    got = {r.url: (r.final, r.resolved)
           for r in resolve_redirects(red, max_hops=8).collect()}
    assert got["a"] == ("d", True)
    assert got["b"] == ("d", True)
    assert got["c"] == ("d", True)
    assert got["x"][1] is False and got["y"][1] is False
    assert got["w"][1] is False          # lands inside the cycle
    # determinism across partitionings
    two = {r.url: (r.final, r.resolved)
           for r in resolve_redirects(red.repartition(7), max_hops=8).collect()}
    assert got == two
