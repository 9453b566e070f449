"""Real robots.txt grammar (crawlspark/robots.py) + parity of the
JVM-side matcher (politeness.ROBOTS_ALLOW_EXPR) with the pure-Python
decision (synth.robots_allowed) over wildcard and precedence cases."""

from __future__ import annotations

from crawlspark.robots import parse_robots
from crawlspark.synth import robots_allowed

GOOGLE_STYLE = """
# comments are ignored
User-agent: googlebot
Disallow: /nogoogle/

User-agent: *
Allow: /p
Disallow: /
Disallow: /*.php$
Allow: /fish*.html
Crawl-delay: 2.5
"""


def test_group_selection_and_delay():
    rules, delay = parse_robots(GOOGLE_STYLE, agent="crawlspark")
    assert delay == 2500
    prefixes = [(r["allow"], r["prefix"]) for r in rules]
    assert (True, "/p") in prefixes and (False, "/") in prefixes
    # specific group: googlebot sees only its own rules
    grules, gdelay = parse_robots(GOOGLE_STYLE, agent="googlebot")
    assert gdelay is None
    assert [(r["allow"], r["prefix"]) for r in grules] == [(False, "/nogoogle/")]


def test_precedence_allow_wins_ties_and_specificity():
    rules, _ = parse_robots("User-agent: *\nAllow: /p\nDisallow: /\n")
    assert robots_allowed("/page", rules)          # /p (spec 2) beats / (1)
    assert not robots_allowed("/quux", rules)      # only / matches
    # exact tie: Allow wins
    rules2, _ = parse_robots("User-agent: *\nAllow: /x\nDisallow: /x\n")
    assert robots_allowed("/x/y", rules2)


def test_wildcards_and_anchors():
    rules, _ = parse_robots(
        "User-agent: *\nDisallow: /*.php$\nDisallow: /private*/data\nAllow: /\n"
    )
    assert not robots_allowed("/index.php", rules)
    assert robots_allowed("/index.php5", rules)       # $ anchors the end
    assert robots_allowed("/index.phpx", rules)
    assert not robots_allowed("/private123/data", rules)
    assert robots_allowed("/private123/datx", rules)
    assert robots_allowed("/ok.html", rules)


def test_empty_and_garbage():
    assert parse_robots(None) == ([], None)
    assert parse_robots("") == ([], None)
    assert parse_robots("not a robots file at all") == ([], None)
    # empty Disallow = no restriction
    rules, _ = parse_robots("User-agent: *\nDisallow:\n")
    assert rules == []
    assert robots_allowed("/anything", rules)


def test_matcher_parity_spark_vs_python(spark):
    """The JVM higher-order-function matcher must agree with the pure
    matcher on every (rules, path) combination, including wildcards,
    anchors, and precedence ties."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from crawlspark.operators.politeness import robots_allowed_col
    from crawlspark.schemas import ROBOTS_RULE

    corpora = [
        "User-agent: *\nAllow: /p\nDisallow: /\n",
        "User-agent: *\nDisallow: /*.php$\nAllow: /\n",
        "User-agent: *\nAllow: /x\nDisallow: /x\n",
        "User-agent: *\nDisallow: /a/*/c\nAllow: /a\n",
        "User-agent: *\nDisallow:\n",
        GOOGLE_STYLE,
    ]
    paths = [
        "/", "/p", "/page", "/quux", "/index.php", "/index.php5",
        "/x/y", "/a/b/c", "/a/bc", "/fish1.html", "/nogoogle/x",
        "/private9/data", "/anything.PHP",
    ]
    rows, want = [], []
    for ci, corpus in enumerate(corpora):
        rules, _ = parse_robots(corpus, agent="crawlspark")
        tuples = [(r["allow"], r["prefix"], r["pattern"], r["spec"]) for r in rules]
        for p in paths:
            rows.append((ci, p, tuples))
            want.append(robots_allowed(p, rules))
    schema = T.StructType(
        [
            T.StructField("ci", T.IntegerType()),
            T.StructField("path", T.StringType()),
            T.StructField("robots_rules", T.ArrayType(ROBOTS_RULE)),
        ]
    )
    df = spark.createDataFrame(rows, schema).withColumn(
        "allowed", robots_allowed_col()
    )
    got = [r["allowed"] for r in df.orderBy("ci", "path").collect()]
    want_sorted = [
        w for _, w in sorted(
            zip([(r[0], r[1]) for r in rows], want), key=lambda t: t[0]
        )
    ]
    assert got == want_sorted


def test_compile_robots_dataframe(spark):
    from crawlspark.robots import compile_robots

    df = spark.createDataFrame(
        [("h1", GOOGLE_STYLE), ("h2", None), ("h3", "User-agent: *\nDisallow: /\n")],
        "host string, robots_txt string",
    )
    out = {r["host"]: r for r in compile_robots(df).collect()}
    assert out["h1"]["crawl_delay_ms"] == 2500
    assert out["h2"]["crawl_delay_ms"] == 1000 and out["h2"]["robots_rules"] == []
    assert out["h3"]["robots_rules"][0]["allow"] is False


def test_parse_sitemaps_is_file_global():
    from crawlspark.robots import parse_sitemaps

    txt = (
        "Sitemap: http://a.example/sitemap.xml\n"   # before any group
        "User-agent: archivebot\n"
        "Disallow: /\n"
        "Sitemap: http://a.example/s2.xml\n"        # inside a foreign group
        "User-agent: *\n"
        "Disallow: /private\n"
        "sitemap: http://a.example/s3.xml  # comment\n"  # case + comment
        "Sitemap: /relative.xml\n"                  # spec: absolute only
    )
    assert parse_sitemaps(txt) == [
        "http://a.example/sitemap.xml",
        "http://a.example/s2.xml",
        "http://a.example/s3.xml",
    ]
    assert parse_sitemaps(None) == []
    assert parse_sitemaps("User-agent: *\nDisallow:\n") == []


def test_compile_robots_emits_sitemaps_column(spark):
    from crawlspark.robots import compile_robots

    df = spark.createDataFrame(
        [("h1", "Sitemap: http://h1/sm.xml\nUser-agent: *\nDisallow: /x\n"),
         ("h2", None)],
        "host string, robots_txt string",
    )
    out = {r["host"]: r for r in compile_robots(df).collect()}
    assert out["h1"]["sitemaps"] == ["http://h1/sm.xml"]
    assert out["h2"]["sitemaps"] == []
