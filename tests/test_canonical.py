"""C37 rel=canonical aliasing: variants fetch but never store, the
declared canonical enters discovery at the variant's depth before the
slot's links; engine == refsim, both parsing the same page bytes."""

from __future__ import annotations

import dataclasses
import tempfile

from crawlspark.engine import CrawlEngine, EngineConfig
from crawlspark.refsim import RefSim
from crawlspark.synth import (UNIT_CANON, GraphConfig,
                              extract_canonical_from_text,
                              extract_links_from_text)

SMALL = GraphConfig(n_sites=3, max_pages=14, batch_size=8, max_cycles=4,
                    canonical_every=2)


def test_parse_helper():
    assert extract_canonical_from_text("no tag") == ""
    assert extract_canonical_from_text(
        'x <link rel="canonical" href="http://a/p3"> y'
    ) == "http://a/p3"
    # the declaration's href IS also a link capture — documented on the
    # knob; the same-depth alias admission always precedes it
    assert extract_links_from_text(
        '<link rel="canonical" href="http://a/p3"> href="http://a/p4"'
    ) == ["http://a/p3", "http://a/p4"]


def test_engine_matches_refsim_under_canonicals(spark):
    ref = RefSim(SMALL).run()
    eng = CrawlEngine(spark, EngineConfig(graph=SMALL, warehouse=tempfile.mkdtemp()))
    eng.run()
    got_order = [
        (r["cycle_id"], r["batch_pos"], r["url_norm"], r["ok"])
        for r in eng.crawl_order().collect()
    ]
    want_order = [(c, p, u, ok) for (c, p, u, _h, _s, _q, _d, _a, ok) in ref.order]
    assert got_order == want_order
    got_docs = {r["doc_id"] for r in eng.documents().select("doc_id").collect()}
    assert got_docs == set(ref.docs)
    got_cn = {
        (r["src"], r["dst"], r["cycle_id"])
        for r in eng.cat.read("canonicals").collect()
    }
    assert got_cn == set(ref.canonicals)
    got_seen = {r["url_norm"] for r in eng.seen_set().collect()}
    assert got_seen == set(ref.seen)


def test_canonical_semantics_bind():
    """The declaration must bite on the registry scenario: variants
    are fetched but not stored, every honored canonical is admitted at
    the VARIANT's depth (never deeper), and the off twin stores more
    docs."""
    on = RefSim(UNIT_CANON).run()
    off = RefSim(dataclasses.replace(UNIT_CANON, canonical_every=0)).run()
    assert on.canonicals
    n_ok = sum(1 for (*_, ok) in on.order if ok)
    assert len(on.docs) < n_ok
    assert len(off.docs) > len(on.docs)
    # no variant URL ever stored
    variants = {src for (src, _dst, _c) in on.canonicals}
    assert not (variants & set(on.docs))
    # depth contract: an alias-admitted canonical's depth equals some
    # variant fetch depth at that cycle (same-depth re-entry, not +1)
    depth_of = {u: d for (_c, _p, u, _h, _s, _q, d, _a, _ok) in on.order}
    for (src, dst, _c) in on.canonicals:
        if dst in depth_of and src in depth_of:
            assert depth_of[dst] <= depth_of[src] + 1


def test_self_canonical_is_noop():
    """A page declaring ITSELF canonical changes nothing: the engine
    flag requires canon != doc_id; synth never emits self-declarations
    (canonical_target always picks a different page)."""
    for i in range(UNIT_CANON.n_sites):
        for j in range(UNIT_CANON.pages_in_site(i)):
            t = UNIT_CANON.canonical_target(i, j)
            if t is not None:
                assert t != UNIT_CANON.page_url(i, j)
