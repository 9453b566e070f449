"""C23 crawler-trap guard: engine == refsim with calendar traps active.

The UNIT_TRAP graph plants an unbounded /cal?d=N chain on two hosts
(each fetch links next-day and next-week) with a lifetime admission
budget of 3 per (host, path) URL pattern. The guard must (a) pin both
trap patterns at exactly the budget, (b) leave every regular pattern
untouched, and (c) preserve full crawl-order parity with the refsim's
sequential budget counter — the strongest available check, since any
admission divergence shifts every later seq/batch_pos.
"""

import tempfile
from dataclasses import replace
from urllib.parse import urlsplit

from crawlspark.engine import CrawlEngine, EngineConfig
from crawlspark.refsim import RefSim
from crawlspark.synth import UNIT, UNIT_TRAP


def _pattern_counts(seen: dict) -> dict:
    pats: dict = {}
    for u in seen:
        sp = urlsplit(u)
        pats[(sp.hostname, sp.path or "/")] = pats.get(
            (sp.hostname, sp.path or "/"), 0
        ) + 1
    return pats


def test_refsim_trap_binds_and_caps():
    res = RefSim(UNIT_TRAP).run()
    pats = _pattern_counts(res.seen)
    budget = UNIT_TRAP.pattern_budget
    assert max(pats.values()) <= budget
    # the trap actually fires: both trap hosts pin /cal at the budget,
    # and the unguarded run admits strictly more
    for i in range(UNIT_TRAP.trap_hosts):
        assert pats[(UNIT_TRAP.host(i), "/cal")] == budget
    unguarded = RefSim(replace(UNIT_TRAP, pattern_budget=None)).run()
    u_cal = sum(1 for u in unguarded.seen if "/cal?" in u)
    assert u_cal > budget * UNIT_TRAP.trap_hosts


def test_budget_inert_on_trapless_graph():
    """Any budget ≥ 1 leaves the default graph bit-identical (every
    path carries exactly one URL), so enabling the guard engine-wide
    is safe."""
    base = RefSim(UNIT).run()
    guarded = RefSim(replace(UNIT, pattern_budget=1)).run()
    assert guarded.order == base.order
    assert guarded.seen == base.seen


def test_engine_matches_refsim_with_traps(spark):
    ref = RefSim(UNIT_TRAP).run()
    eng = CrawlEngine(
        spark, EngineConfig(graph=UNIT_TRAP, warehouse=tempfile.mkdtemp())
    )
    eng.run()

    got_order = [
        (r["cycle_id"], r["batch_pos"], r["url_norm"], r["host"],
         r["score"], r["seq"], r["depth"], r["attempt"], r["ok"])
        for r in eng.crawl_order().collect()
    ]
    assert got_order == [tuple(r) for r in ref.order]

    got_seen = {
        (r["url_norm"], r["first_cycle"]) for r in eng.seen_set().collect()
    }
    assert got_seen == set(ref.seen.items())

    # the persisted pattern_counts state equals the seen-set rollup,
    # and no pattern ever exceeds the budget
    pc = {
        (r["host"], r["path"]): r["n"]
        for r in eng.cat.read("pattern_counts")
        .groupBy("host", "path")
        .sum("n")
        .withColumnRenamed("sum(n)", "n")
        .collect()
    }
    assert pc == _pattern_counts(ref.seen)
    assert max(pc.values()) <= UNIT_TRAP.pattern_budget
