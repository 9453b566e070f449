"""C21 active re-crawl (reseed): engine == refsim on UNIT_RESEED.

After 4 discovery cycles the 5 lexicographically-first seen URLs are
reseeded (forget + depth-0 re-inject with strictly-new seqs); cycles
5-10 then re-fetch them in normal (score, seq) competition. The
contract: old identity dropped (first_cycle re-stamped, retry state
cleared — attempts restart at 1), lexicographic seq assignment, and
the full post-reseed fetch order matching the refsim's sequential
replay.
"""

import tempfile

from crawlspark.engine import CrawlEngine, EngineConfig
from crawlspark.refsim import RefSim
from crawlspark.synth import UNIT_RESEED


def test_refsim_reseed_semantics():
    from dataclasses import replace

    r = RefSim(UNIT_RESEED).run()
    # the victims: lex-first 5 of the seen set as of cycle reseed_after
    # (recomputed via a reseed-disabled twin run truncated there)
    pre = RefSim(replace(UNIT_RESEED, reseed_after=None, reseed_k=0)).run(
        max_cycles=UNIT_RESEED.reseed_after
    )
    victims = sorted(pre.seen)[: UNIT_RESEED.reseed_k]
    # every victim is re-stamped to the reseed cycle
    assert all(r.seen[u] == UNIT_RESEED.reseed_after for u in victims)
    refetched = {
        u for u in victims
        if any(o[2] == u and o[0] > UNIT_RESEED.reseed_after for o in r.order)
    }
    assert refetched, "no reseeded URL was re-fetched"
    for u in refetched:
        post = [o for o in r.order if o[2] == u and o[0] > UNIT_RESEED.reseed_after]
        # attempts restart at 1 and depth re-injects as 0
        assert post[0][7] == 1
        assert post[0][6] == 0


def test_engine_matches_refsim_with_reseed(spark):
    ref = RefSim(UNIT_RESEED).run()
    eng = CrawlEngine(
        spark, EngineConfig(graph=UNIT_RESEED, warehouse=tempfile.mkdtemp())
    )
    eng.run(max_cycles=UNIT_RESEED.reseed_after)
    victims = [
        r["url_norm"]
        for r in eng.seen_set().orderBy("url_norm")
        .limit(UNIT_RESEED.reseed_k).collect()
    ]
    assert eng.reseed(victims)["reseeded"] == UNIT_RESEED.reseed_k
    eng.run()

    got_order = [
        (r["cycle_id"], r["batch_pos"], r["url_norm"], r["score"],
         r["seq"], r["depth"], r["attempt"], r["ok"])
        for r in eng.crawl_order().collect()
    ]
    want_order = [
        (c, p, u, s, q, d, a, ok)
        for (c, p, u, _h, s, q, d, a, ok) in ref.order
    ]
    assert got_order == want_order

    got_seen = {
        r["url_norm"]: r["first_cycle"] for r in eng.seen_set().collect()
    }
    assert got_seen == ref.seen
