"""C26 sitemap ingestion: engine == refsim with sitemaps active.

UNIT_SMAP seeds /sitemap.xml on every other host; the sitemap fetches
through normal politeness/ordering, and its <loc> children enter
discovery at depth 1 — including orphan pages no link-graph path
reaches (the discovery source sitemaps exist for).
"""

import tempfile

from crawlspark.engine import CrawlEngine, EngineConfig
from crawlspark.refsim import RefSim
from crawlspark.synth import UNIT, UNIT_SMAP, UNIT_SMAPIDX


def test_refsim_sitemap_discovers_orphans():
    base = RefSim(UNIT).run()
    smap = RefSim(UNIT_SMAP).run()
    maps = {u for u in smap.seen if u.endswith("/sitemap.xml")}
    assert maps, "no sitemap was seeded"
    # sitemap children include pages the plain crawl never saw
    extra = set(smap.seen) - set(base.seen) - maps
    assert extra
    # at least one extra page came DIRECTLY from a sitemap (the rest
    # may be reached transitively through sitemap-discovered pages)
    via_map = {d for s, d in smap.edges if s.endswith("/sitemap.xml")}
    assert extra & via_map


def test_engine_matches_refsim_with_sitemaps(spark):
    ref = RefSim(UNIT_SMAP).run()
    eng = CrawlEngine(
        spark, EngineConfig(graph=UNIT_SMAP, warehouse=tempfile.mkdtemp())
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


def test_refsim_nested_sitemaps_and_robots_directive():
    """C26 extensions: sitemap URLs learned ONLY from robots.txt
    `Sitemap:` directives, and the index → child → urlset fan-out."""
    cfg = UNIT_SMAPIDX
    # no sitemap URL in the raw operator page seeds — they all come
    # through the directive parser round-trip
    assert all("sitemap" not in u for u in cfg.seeds()
               if not u.endswith("/sitemap.xml"))
    declared = [u for u in cfg.seeds() if u.endswith("/sitemap.xml")]
    assert declared == [
        cfg.sitemap_url(i) for i in range(cfg.n_sites) if cfg.has_sitemap(i)
    ]
    r = RefSim(cfg).run()
    idx = {u for u in r.seen if u.endswith("/sitemap.xml")}
    kids = {u for u in r.seen if "/sitemap-" in u}
    assert idx and kids
    # children are discovered FROM the index, pages FROM the children
    via_idx = {d for s, d in r.edges if s.endswith("/sitemap.xml")}
    assert kids <= via_idx
    via_kid = {d for s, d in r.edges if "/sitemap-" in s}
    assert via_kid - idx - kids, "child sitemaps admitted no pages"
    # nesting still surfaces orphans the plain link graph never reaches
    base = RefSim(UNIT).run()
    assert (set(r.seen) - set(base.seen) - idx - kids) & via_kid


def test_engine_matches_refsim_nested_sitemaps(spark):
    ref = RefSim(UNIT_SMAPIDX).run()
    eng = CrawlEngine(
        spark, EngineConfig(graph=UNIT_SMAPIDX, warehouse=tempfile.mkdtemp())
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


def test_refsim_lastmod_revisit_is_selective():
    """C25∘C26: the sitemap-lastmod revisit re-fetches ONLY pages that
    are (a) listed in a sitemap AND (b) re-published since their last
    successful fetch — never unlisted or unchanged pages."""
    from collections import Counter

    from crawlspark.synth import UNIT_SMLASTMOD as g

    res = RefSim(g).run()
    cnt = Counter(u for (_c, _p, u, _h, _s, _q, _d, _a, ok) in res.order if ok)
    refetched = {u for u, n in cnt.items() if n > 1}
    assert refetched, "scenario produced no sitemap-driven re-fetches"

    listed = set()
    for i in range(g.n_sites):
        if g.has_sitemap(i):
            listed |= {g.page_url(i, jj) for jj in g.sitemap_pages(i)}
    assert refetched <= listed, "re-fetched an unlisted page"

    # every re-fetched page was genuinely re-published between its
    # first ok fetch and the sweep cycle (lastmod > fetch cycle)
    first_ok = {}
    for (c, _p, u, _h, _s, _q, _d, _a, ok) in res.order:
        if ok and u not in first_ok:
            first_ok[u] = c
    sweep = g.sitemap_revisit_after
    for u in refetched:
        i, j = g.url_to_page(u)
        lm = int(g.lastmod_date(i, j, sweep).split("-")[2]) - 1
        assert lm > first_ok[u], (u, lm, first_ok[u])

    # and the sweep skipped at least one LISTED page that was fetched
    # but not re-published — selectivity, not a blanket sweep
    skipped = {
        u for u in (listed & set(first_ok)) - refetched
        if int(
            g.lastmod_date(*g.url_to_page(u), sweep).split("-")[2]
        ) - 1 <= first_ok[u]
    }
    assert skipped
