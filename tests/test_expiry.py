"""Snapshot expiry / data GC (Catalog.expire_snapshots): current reads
unaffected, old manifests + unreferenced dirs deleted, orphans from
crashed commits swept, and the engine crawls on after expiry."""

from pathlib import Path

from crawlspark.engine import CrawlEngine, EngineConfig
from crawlspark.synth import GraphConfig

G = GraphConfig(n_sites=4, max_pages=12, batch_size=8, max_cycles=3)


def _dirs(wh) -> set:
    return {
        f"{t.name}/{d.name}"
        for t in (Path(wh) / "data").iterdir() if t.is_dir()
        for d in t.iterdir()
    }


def test_expire_keeps_current_reads_and_frees_history(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh-expire"))
    eng = CrawlEngine(spark, EngineConfig(graph=G, warehouse=wh))
    eng.run()
    # an orphan dir, as a crashed commit would leave (never referenced)
    orphan = Path(wh) / "data" / "frontier" / "s999999-001"
    orphan.mkdir(parents=True)
    (orphan / "junk.parquet").write_bytes(b"x" * 128)

    before_rows = sorted(tuple(r) for r in eng.seen_set().collect())
    before_order = [tuple(r) for r in eng.crawl_order().collect()]
    n_snaps_before = len(eng.cat.snapshots())
    n_dirs_before = len(_dirs(wh))
    assert n_snaps_before > 2

    res = eng.cat.expire_snapshots(keep_last=2)
    assert res["removed_snapshots"] == n_snaps_before - 2
    assert res["retained"] == 2
    assert res["freed_bytes"] > 0
    assert not orphan.exists()  # orphan swept
    assert len(_dirs(wh)) < n_dirs_before
    assert len(eng.cat.snapshots()) == 2

    # current snapshot reads bit-identical
    assert sorted(tuple(r) for r in eng.seen_set().collect()) == before_rows
    assert [tuple(r) for r in eng.crawl_order().collect()] == before_order
    # every retained-referenced dir still exists
    live = {
        d.split("data/", 1)[1]
        for s in eng.cat.snapshots()
        for ds in s["tables"].values()
        for d in ds
    }
    assert live <= _dirs(wh)

    # the engine continues and resumes after expiry
    st = eng.run_cycle(G.max_cycles + 1)
    assert st["cycle"] == G.max_cycles + 1
    eng2 = CrawlEngine(spark, EngineConfig(graph=G, warehouse=wh))
    eng2.bootstrap()
    assert eng2.max_seq == eng.max_seq


def test_fold_state_auto_expiry(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh-autoexp"))
    eng = CrawlEngine(
        spark,
        EngineConfig(graph=G, warehouse=wh, compact_every=2, expire_keep_last=2),
    )
    eng.run()
    assert len(eng.cat.snapshots()) <= 3  # post-fold commits + tail cycles
    # still crawlable + readable
    assert eng.seen_set().count() > 0
