"""Mid-crawl politeness refresh (CrawlEngine.update_politeness):
new rules prune the queued frontier once, later cycles never fetch
newly-disallowed URLs, priority changes re-score without touching
seq, and retired hosts disappear."""

from pyspark.sql import functions as F

from crawlspark.engine import CrawlEngine, EngineConfig
from crawlspark.synth import GraphConfig

G = GraphConfig(n_sites=4, max_pages=20, batch_size=10, max_cycles=6)
DENY_HOST = "site0000.example.com"


def _deny_all():
    return F.array(
        F.struct(
            F.lit(False).alias("allow"),
            F.lit("/").alias("prefix"),
            F.lit(None).cast("string").alias("pattern"),
            F.lit(1).alias("spec"),
        )
    )


def test_update_politeness_prunes_and_rescores(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh-polupd"))
    eng = CrawlEngine(spark, EngineConfig(graph=G, warehouse=wh))
    eng.bootstrap()
    for c in (1, 2):
        eng.run_cycle(c)

    hc = eng.cat.read("host_config")
    hc2 = hc.withColumn(
        "robots_rules",
        F.when(F.col("host") == DENY_HOST, _deny_all()).otherwise(
            F.col("robots_rules")
        ),
    )
    fr_before = eng.cat.read("frontier")
    total_before = fr_before.count()
    denied_before = fr_before.filter(F.col("host") == DENY_HOST).count()
    res = eng.update_politeness(hc2)
    after_f = eng.cat.read("frontier")
    assert after_f.filter(F.col("host") == DENY_HOST).count() == 0
    assert res["queued_after"] == total_before - denied_before
    assert after_f.count() == total_before - denied_before

    # seq untouched for surviving rows; score consistent with priority
    row = after_f.select("depth", "site_priority", "score").first()
    if row:
        assert row["score"] == row["depth"] + row["site_priority"]

    # later cycles never fetch the denied host again
    for c in range(3, G.max_cycles + 1):
        st = eng.run_cycle(c)
        if st["stop"]:
            break
    post = (
        eng.crawl_order()
        .filter((F.col("cycle_id") >= 3) & (F.col("host") == DENY_HOST))
        .count()
    )
    assert post == 0
    # discovery-time filtering also applies the new rules to fresh links
    seen_hosts = {
        r["host"]
        for r in eng.cat.read("frontier").select("host").distinct().collect()
    }
    assert DENY_HOST not in seen_hosts


def test_update_politeness_retires_missing_hosts(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh-polret"))
    eng = CrawlEngine(spark, EngineConfig(graph=G, warehouse=wh))
    eng.bootstrap()
    eng.run_cycle(1)
    hc = eng.cat.read("host_config").filter(F.col("host") != DENY_HOST)
    eng.update_politeness(hc)
    assert (
        eng.cat.read("frontier").filter(F.col("host") == DENY_HOST).count() == 0
    )
    assert (
        eng.cat.read("host_config").filter(F.col("host") == DENY_HOST).count()
        == 0
    )


def test_refsim_robots_revision_script():
    """The UNIT_ROBREV refsim script (the q104 oracle): host 0's
    fetches stop at the revision cycle, no later admission lands on
    it, survivors keep their (score, seq) ordering, and the crawl
    continues on the other hosts."""
    from dataclasses import replace

    from crawlspark.refsim import RefSim
    from crawlspark.synth import UNIT_ROBREV

    res = RefSim(UNIT_ROBREV).run()
    h0 = UNIT_ROBREV.host(0)
    after = UNIT_ROBREV.robots_revoke_after
    assert not any(
        h == h0 and c > after
        for (c, _p, _u, h, _s, _q, _d, _a, _ok) in res.order
    )
    assert any(h == h0 for (_c, _p, _u, h, *_r) in res.order)
    assert max(c for (c, *_r) in res.order) == UNIT_ROBREV.max_cycles
    # seen rows admitted pre-revision survive the prune (append-only)
    pre_seen = {u for u, fc in res.seen.items() if fc <= after}
    assert pre_seen <= set(res.seen)
    # the revision only removes work: every attempt present in the
    # revised run appears in the unrevised baseline at the same
    # (cycle, batch_pos) until the revision cycle
    base = RefSim(replace(UNIT_ROBREV, robots_revoke_after=None)).run()
    pre = [r for r in res.order if r[0] <= after]
    assert pre == [r for r in base.order if r[0] <= after]


def test_scope_filter_identity_when_off(spark):
    """C29/C30 default-off contract: with no scope knobs set,
    scope_filter must return the input DataFrame object itself — the
    existing admission plan is untouched."""
    from crawlspark.operators import politeness
    from crawlspark.synth import UNIT

    df = spark.range(3).withColumnRenamed("id", "depth")
    assert politeness.scope_filter(df, UNIT) is df


def test_refsim_crawl_scope_rules():
    """The UNIT_SCOPE refsim script (the q108 oracle): nothing deeper
    than max_depth is ever scheduled, no denied URL enters the seen
    set, and the scope rules — not the cycle budget — are what bound
    the crawl (the unscoped twin goes deeper and further)."""
    import re
    from dataclasses import replace

    from crawlspark.refsim import RefSim
    from crawlspark.synth import UNIT_SCOPE

    res = RefSim(UNIT_SCOPE).run()
    assert max(o[6] for o in res.order) == UNIT_SCOPE.max_depth
    assert not any(
        re.search(p, u) for p in UNIT_SCOPE.url_deny for u in res.seen
    )
    base = RefSim(replace(UNIT_SCOPE, max_depth=None, url_deny=())).run()
    assert max(o[6] for o in base.order) > UNIT_SCOPE.max_depth
    assert len(base.seen) > len(res.seen)


def test_refsim_delay_driven_refill():
    """C31 (the q109 oracle): with delay_driven_refill on, each host's
    refill is floor(cycle_duration / its declared Crawl-delay), whole
    tokens with a liveness floor of 1 — and the drain order genuinely
    differs from the synthetic-refill baseline (the linkage binds)."""
    from crawlspark.refsim import RefSim
    from crawlspark.synth import UNIT, UNIT_DELAY

    for i in range(UNIT_DELAY.n_sites):
        expect = max(
            1, UNIT_DELAY.cycle_duration_ms // UNIT_DELAY.crawl_delay_ms(i)
        )
        assert UNIT_DELAY.refill_per_cycle(i) == float(expect)
        assert UNIT_DELAY.refill_per_cycle(i).is_integer()
    res = RefSim(UNIT_DELAY).run()
    base = RefSim(UNIT).run()
    assert res.order != base.order
    # same discovered universe in the end (politeness paces, it does
    # not exclude): seen keys must agree up to budget effects — every
    # delay-run discovery is a baseline discovery or vice versa is
    # NOT required, but both must include all seeds
    seeds = {u for u, c in res.seen.items() if c == 0}
    assert seeds == {u for u, c in base.seen.items() if c == 0}
