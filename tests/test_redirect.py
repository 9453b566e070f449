"""C24 redirect handling: engine == refsim with 301 aliases active.

UNIT_REDIR emits every 3rd outlink as a `/r{j}` short-link alias whose
fetch 301s to the canonical page. The contract: a successful 301
terminally resolves the alias (no document), its Location re-enters
the discovery path at the SAME depth ordered before that batch slot's
links, targets already seen dedup, targets the robots rules forbid
(e.g. a 301 into /private) die at admission, and every hop lands in
the append-only redirect map. Full crawl-order parity is the strongest
check — any admission divergence shifts every later seq/batch_pos.
"""

import tempfile

from crawlspark.engine import CrawlEngine, EngineConfig
from crawlspark.refsim import RefSim
from crawlspark.synth import UNIT_REDIR


def test_refsim_redirect_semantics():
    r = RefSim(UNIT_REDIR).run()
    assert len(r.redirects) > 0
    aliases = {s for s, _, _ in r.redirects}
    # aliases are fetched (appear in the order log) but never documents
    fetched = {u for (_c, _p, u, *_rest) in r.order}
    assert aliases <= fetched
    assert not (aliases & set(r.docs))
    # at least one 301 into /private dies at robots admission
    dead = [d for _s, d, _c in r.redirects if d not in r.seen]
    assert dead and all("/private/" in d for d in dead)
    # every admitted target entered at or before its hop cycle +0 depth
    # semantics: the target's queue score equals the alias's (same
    # depth), so it can be scheduled the very next cycle
    for _s, d, c in r.redirects:
        if d in r.seen:
            assert r.seen[d] <= c


def test_engine_matches_refsim_with_redirects(spark):
    ref = RefSim(UNIT_REDIR).run()
    eng = CrawlEngine(
        spark, EngineConfig(graph=UNIT_REDIR, warehouse=tempfile.mkdtemp())
    )
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

    got_redirs = {
        (r["src"], r["dst"], r["cycle_id"])
        for r in eng.redirect_map().collect()
    }
    assert got_redirs == set(ref.redirects)

    # aliases never land in documents
    doc_ids = {r["doc_id"] for r in eng.documents().select("doc_id").collect()}
    assert doc_ids == set(ref.docs)

    # fetch_log reports 301 for exactly the redirect hops
    n301 = eng.fetch_log().filter("status = 301").count()
    assert n301 == len(ref.redirects)
