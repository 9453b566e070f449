"""The three reference-semantics gates (BASELINE.json north_star):
identical crawl ordering, identical final URL-seen set, and
per-document span-sequence equality — Spark engine vs refsim, same
seed list + politeness budget.
"""

import pytest

from crawlspark.engine import CrawlEngine, EngineConfig
from crawlspark.synth import UNIT

from .refsim import RefSim


@pytest.fixture(scope="module")
def run_pair(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("wh-equiv")
    eng = CrawlEngine(spark, EngineConfig(graph=UNIT, warehouse=str(wh)))
    eng.run()
    ref_order, ref_seen, ref_docs = RefSim(UNIT).run()
    return eng, ref_order, ref_seen, ref_docs


def test_crawl_ordering_identical(run_pair):
    eng, ref_order, _, _ = run_pair
    got = [
        (r["cycle_id"], r["batch_pos"], r["url_norm"], r["attempt"], r["ok"])
        for r in eng.crawl_order().collect()
    ]
    assert len(got) > 0
    assert any(not ok for *_, ok in got), "failure model should fire"
    assert got == ref_order


def test_url_seen_set_identical(run_pair):
    eng, _, ref_seen, _ = run_pair
    got = {r["url_norm"]: r["first_cycle"] for r in eng.seen_set().collect()}
    assert got == ref_seen


def test_span_sequence_equality(run_pair):
    """input_hint invariant: per-document (kind, text, media_ref, order)."""
    eng, _, _, ref_docs = run_pair
    rows = eng.documents().collect()
    got = {
        r["doc_id"]: (
            r["fetch_cycle"],
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]],
        )
        for r in rows
    }
    want = {
        u: (c, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
        for u, (c, spans) in ref_docs.items()
    }
    assert got == want


def test_deterministic_across_parallelism(spark, tmp_path_factory, run_pair):
    """C18 gate: identical outputs when shuffle parallelism changes."""
    eng, ref_order, _, _ = run_pair
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "13")
    try:
        wh = tmp_path_factory.mktemp("wh-par13")
        eng2 = CrawlEngine(spark, EngineConfig(graph=UNIT, warehouse=str(wh)))
        eng2.run()
        got = [
            (r["cycle_id"], r["batch_pos"], r["url_norm"], r["attempt"], r["ok"])
            for r in eng2.crawl_order().collect()
        ]
        assert got == ref_order
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_equivalence_at_t2_scale(spark, tmp_path_factory):
    """Same three gates at a 50-site / ~2.8k-page / 8-cycle graph with
    a mega-host (Zipf head) — exercises the salted cap and large-batch
    paths the UNIT graph cannot reach."""
    from crawlspark.synth import GraphConfig

    g = GraphConfig(n_sites=24, max_pages=400, batch_size=96,
                    out_degree=5, max_cycles=5, token_mult=3)
    wh = tmp_path_factory.mktemp("wh-t2")
    eng = CrawlEngine(spark, EngineConfig(graph=g, warehouse=str(wh), n_salt=4))
    eng.run()
    ref_order, ref_seen, ref_docs = RefSim(g).run()

    got_order = [
        (r["cycle_id"], r["batch_pos"], r["url_norm"], r["attempt"], r["ok"])
        for r in eng.crawl_order().collect()
    ]
    assert len(got_order) > 200
    assert got_order == ref_order
    got_seen = {r["url_norm"]: r["first_cycle"] for r in eng.seen_set().collect()}
    assert got_seen == ref_seen
    got_docs = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in eng.documents().collect()
    }
    want_docs = {
        u: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]
        for u, (c, spans) in ref_docs.items()
    }
    assert got_docs == want_docs
