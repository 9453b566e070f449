"""C33 nested-PSL extension: publicsuffix.org registered-domain
extraction — plain, multi-level, wildcard (*.ck), exception (!www.ck)
and implicit-default rules — as pure column math, bit-equal to the
sequential twin, and exactly the legacy last-3 grouping on every
synthetic host shape (the engine-equivalence that keeps q114's
contract byte-identical).
"""

from pyspark.sql import functions as F

from crawlspark.urlnorm import registered_domain, registered_domain_py

RULES = (
    "com", "uk", "co.uk", "au", "com.au", "us", "ca.us", "k12.ca.us",
    "*.ck", "!www.ck", "example.com",
)

HOSTS = [
    "example.com",            # IS a public suffix under these rules -> NULL
    "a.example.com",
    "foo.com",
    "b.a.site.co.uk",         # multi-level plain rule
    "site.co.uk",
    "co.uk",                  # NULL
    "x.com.au",
    "school.k12.ca.us",       # 3-label suffix
    "d.school.k12.ca.us",
    "www.ck",                 # exception beats *.ck -> itself
    "foo.www.ck",
    "bar.other.ck",           # wildcard suffix other.ck
    "other.ck",               # NULL (wildcard makes it a suffix)
    "foo.zz",                 # implicit * default rule
    "zz",                     # NULL
    "localhost",              # NULL
]


def test_spark_matches_twin(spark):
    df = spark.createDataFrame([(h,) for h in HOSTS], ["host"])
    got = {
        r["host"]: r["reg"]
        for r in df.select(
            "host", registered_domain("host", RULES).alias("reg")
        ).collect()
    }
    assert got == {h: registered_domain_py(h, RULES) for h in HOSTS}
    # pin the semantics, not just the twin agreement
    assert got["b.a.site.co.uk"] == "site.co.uk"
    assert got["www.ck"] == "www.ck" and got["foo.www.ck"] == "www.ck"
    assert got["bar.other.ck"] == "bar.other.ck" and got["other.ck"] is None
    assert got["foo.zz"] == "foo.zz" and got["zz"] is None
    assert got["example.com"] is None


def test_engine_equivalence_on_synth_hosts(spark):
    """rules=("example.com",) must reproduce substring_index(host,'.',-3)
    on every synthetic host shape — the invariant that keeps the C33
    politeness buckets (and q114's refsim contract) byte-identical."""
    hosts = (
        [f"site{i:04d}.example.com" for i in range(8)]
        + [f"s{g}.dom{d:04d}.example.com" for g in range(3) for d in range(4)]
    )
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    rows = df.select(
        "host",
        F.coalesce(
            registered_domain("host", ("example.com",)), F.col("host")
        ).alias("psl"),
        F.substring_index("host", ".", -3).alias("last3"),
    ).collect()
    assert all(r["psl"] == r["last3"] for r in rows)
    for h in hosts:
        assert (
            registered_domain_py(h, ("example.com",))
            == ".".join(h.split(".")[-3:])
        )


def test_exception_beats_longer_plain_match(spark):
    """PSL precedence: an exception rule prevails over ANY other
    matching rule, even a longer plain one."""
    rules = ("a.b.c", "!b.c", "c")
    # plain a.b.c matches (3 labels) but exception b.c wins: public
    # suffix = c, registered = b.c
    assert registered_domain_py("x.a.b.c", rules) == "b.c"
    df = spark.createDataFrame([("x.a.b.c",)], ["host"])
    assert (
        df.select(registered_domain("host", rules).alias("r")).first()["r"]
        == "b.c"
    )
