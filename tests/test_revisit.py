"""C25 freshness re-crawl: engine == refsim with versioned content.

UNIT_REV publishes versioned pages (re-publish period 3-9 cycles),
runs 6 discovery cycles, revisits URLs whose last successful fetch is
≥ 3 cycles old (forget + lexicographic depth-0 reseed), then runs
cycles 7-9. The contract: the same URLs re-queue with strictly-new
seqs, re-fetches land NEW document rows (the append-only version
history), some re-fetched content changed and some did not (the change
detector must see both), and the full post-revisit crawl order matches
the refsim's sequential replay.
"""

import json
import tempfile

from crawlspark.engine import CrawlEngine, EngineConfig
from crawlspark.refsim import RefSim
from crawlspark.synth import UNIT_REV


def test_refsim_revisit_semantics():
    r = RefSim(UNIT_REV).run()
    byu = {}
    for u, c, spans in r.doc_log:
        byu.setdefault(u, []).append(json.dumps(spans, sort_keys=True))
    multi = {u: sigs for u, sigs in byu.items() if len(sigs) > 1}
    assert multi, "revisit produced no second versions"
    changed = sum(1 for sigs in multi.values() if len(set(sigs)) > 1)
    unchanged = sum(1 for sigs in multi.values() if len(set(sigs)) == 1)
    assert changed > 0 and unchanged > 0
    # revisited URLs re-enter the seen set at the revisit cycle
    assert any(c == UNIT_REV.revisit_after for c in r.seen.values())


def test_engine_matches_refsim_with_revisit(spark):
    ref = RefSim(UNIT_REV).run()
    eng = CrawlEngine(
        spark, EngineConfig(graph=UNIT_REV, warehouse=tempfile.mkdtemp())
    )
    eng.run(max_cycles=UNIT_REV.revisit_after)
    out = eng.revisit(UNIT_REV.revisit_min_age)
    assert out["revisited"] > 0
    eng.run()

    got_order = [
        (r["cycle_id"], r["batch_pos"], r["url_norm"], r["attempt"], r["ok"])
        for r in eng.crawl_order().collect()
    ]
    want_order = [
        (c, p, u, a, ok) for (c, p, u, _h, _s, _q, _d, a, ok) in ref.order
    ]
    assert got_order == want_order

    got_seen = {
        r["url_norm"]: r["first_cycle"] for r in eng.seen_set().collect()
    }
    assert got_seen == ref.seen

    # version history: every successful fetch is a documents row
    got_docs = sorted(
        (r["doc_id"], r["fetch_cycle"])
        for r in eng.documents().select("doc_id", "fetch_cycle").collect()
    )
    want_docs = sorted((u, c) for u, c, _s in ref.doc_log)
    assert got_docs == want_docs


def test_refsim_conditional_fetch_versions():
    """C32 (the q110 oracle): under conditional fetch every stored
    version differs from its predecessor (re-storing an unchanged
    page is forbidden), the stored log is a subset of the
    unconditional run's, and genuinely-changed pages still land all
    their versions."""
    from crawlspark.refsim import RefSim
    from crawlspark.synth import UNIT_COND, UNIT_REV

    cond = RefSim(UNIT_COND).run()
    rev = RefSim(UNIT_REV).run()
    assert len(cond.doc_log) < len(rev.doc_log)
    last: dict = {}
    for u, _c, s in cond.doc_log:
        assert last.get(u) != s, f"{u} stored an unchanged version"
        last[u] = s
    # distinct-sig version sequences agree with the unconditional run:
    # conditional mode drops only exact-repeat adjacents
    def runs(log):
        seqs: dict = {}
        for u, _c, s in log:
            key = repr(s)
            prev = seqs.setdefault(u, [])
            if not prev or prev[-1] != key:
                prev.append(key)
        return seqs

    assert runs(cond.doc_log) == runs(rev.doc_log)
