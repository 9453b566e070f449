"""Streaming surface tests (SURVEY.md §2.4): batch/stream parity for
windowed aggregation and session windows via trigger(availableNow),
stateful token buckets across micro-batches, and the exactly-once
manifest sink."""

from __future__ import annotations

import tempfile
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from crawlspark import streaming as S
from crawlspark.catalog import Catalog


@pytest.fixture(scope="module")
def events_dir(spark):
    d = tempfile.mkdtemp(prefix="events-stream-")
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # several files => several source splits
    df.repartition(4).write.mode("overwrite").parquet(d)
    return d


def _run_available_now(q_writer, out_name):
    q = (
        q_writer.format("memory")
        .queryName(out_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_rates_matches_batch(spark, events_dir):
    stream = S.file_stream(spark, events_dir, S.EVENTS_SCHEMA)
    agg = S.windowed_rates(stream, window="6 hours", watermark="1 hour")
    _run_available_now(agg.writeStream, "win_rates")
    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.table("win_rates").collect()
    }

    batch = spark.read.schema(S.EVENTS_SCHEMA).parquet(events_dir)
    want = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in (
            batch.groupBy(
                F.unix_timestamp(F.window("ts", "6 hours").start).alias("win_start"),
                "event_type",
            )
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
            .collect()
        )
    }
    assert got == want and len(got) > 0


def test_session_counts_matches_batch(spark, events_dir):
    stream = S.file_stream(spark, events_dir, S.EVENTS_SCHEMA)
    agg = S.session_counts(stream, gap="30 minutes")
    _run_available_now(agg.writeStream, "sessions")
    got = spark.table("sessions")
    n_stream = got.agg(F.sum("n_events")).collect()[0][0]
    n_batch = spark.read.parquet(events_dir).count()
    assert n_stream == n_batch  # every event lands in exactly one session
    # session integrity: no two sessions of a user overlap
    by_user: dict[int, list[tuple[int, int]]] = {}
    for r in got.collect():
        by_user.setdefault(r["user_id"], []).append((r["sess_start"], r["sess_end"]))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2


def test_token_bucket_state_across_batches(spark, events_dir):
    # one source file per micro-batch => state must carry across batches
    stream = S.file_stream(spark, events_dir, S.EVENTS_SCHEMA, max_files_per_trigger=1)
    reqs = stream.select(F.concat(F.lit("h"), (F.col("user_id") % 3).cast("string")).alias("host"))
    out = S.token_bucket_stream(reqs, capacity=10.0, refill=5.0)
    q = (
        out.writeStream.format("memory")
        .queryName("buckets")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("buckets").collect()
    assert len(rows) >= 3
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for host, hs in by_host.items():
        for r in hs:
            assert r["allowed"] <= r["requested"]
            assert 0 <= r["tokens_left"] <= 10.0
        # politeness cap binds: a host can never be allowed more than
        # capacity + refills across the whole run
        total_allowed = sum(r["allowed"] for r in hs)
        assert total_allowed <= 10.0 + 5.0 * len(hs)


def test_manifest_sink_exactly_once(spark, events_dir):
    wh = tempfile.mkdtemp(prefix="stream-sink-")
    cat = Catalog(spark, wh)
    stream = S.file_stream(spark, events_dir, S.EVENTS_SCHEMA).select(
        F.lit(0).cast("long").alias("cycle_id"),
        F.xxhash64("event_id").alias("url_hash"),
        F.lit("h").alias("host"),
        F.lit(200).alias("status"),
        F.col("ts").cast("timestamp").alias("fetched_at"),
        F.lit(1).cast("long").alias("bytes"),
    )
    ckpt = str(Path(wh) / "ckpt")
    q = S.manifest_sink(stream, cat, "fetch_log", ckpt).trigger(availableNow=True).start()
    q.awaitTermination(120)
    n1 = cat.read("fetch_log").count()
    assert n1 == spark.read.parquet(events_dir).count()
    # restart with same checkpoint: no new data -> no duplicate rows
    stream2 = S.file_stream(spark, events_dir, S.EVENTS_SCHEMA).select(
        F.lit(0).cast("long").alias("cycle_id"),
        F.xxhash64("event_id").alias("url_hash"),
        F.lit("h").alias("host"),
        F.lit(200).alias("status"),
        F.col("ts").cast("timestamp").alias("fetched_at"),
        F.lit(1).cast("long").alias("bytes"),
    )
    q2 = S.manifest_sink(stream2, cat, "fetch_log", ckpt).trigger(availableNow=True).start()
    q2.awaitTermination(120)
    assert cat.read("fetch_log").count() == n1


def test_crawl_schedule_stream_matches_batch_and_refsim(spark, tmp_path_factory):
    """The streaming crawl wrapper (S1 over the engine's own tables):
    tailing the committed `scheduled` log one file per micro-batch and
    aggregating to completion must equal both the batch aggregation of
    the same table AND the refsim drain history."""
    from crawlspark.engine import CrawlEngine, EngineConfig
    from crawlspark.refsim import RefSim
    from crawlspark.synth import GraphConfig

    g = GraphConfig(n_sites=4, max_pages=24, batch_size=12, max_cycles=3)
    wh = tmp_path_factory.mktemp("wh-stream-crawl")
    eng = CrawlEngine(spark, EngineConfig(graph=g, warehouse=str(wh)))
    eng.run()

    stream = S.crawl_schedule_stream(spark, str(wh), max_files_per_trigger=1)
    q = _run_available_now(
        S.crawl_cycle_rates(stream).writeStream, "crawl_stream_rates"
    )
    assert q.lastProgress is not None
    got = {
        (r["cycle_id"], r["host"]): (r["n_attempts"], r["n_ok"], r["max_batch_pos"])
        for r in spark.table("crawl_stream_rates").collect()
    }

    batch = {
        (r["cycle_id"], r["host"]): (r["n_attempts"], r["n_ok"], r["max_batch_pos"])
        for r in S.crawl_cycle_rates(eng.cat.read("scheduled")).collect()
    }
    assert got == batch

    by_ch = {}
    for (c, pos, _u, host, _sc, _sq, _d, _att, ok) in RefSim(g).run().order:
        by_ch.setdefault((c, host), []).append((pos, ok))
    want = {
        k: (len(v), sum(1 for _p, ok in v if ok), max(p for p, _ok in v))
        for k, v in by_ch.items()
    }
    assert got == want


def test_manifest_sink_incremental_restart(spark):
    """S10 flavor of S6: exactly-once RESUME — after the first
    availableNow run drains the source, NEW files arrive and a fresh
    query on the SAME checkpoint picks up exactly the delta: no
    replays of old epochs, no misses, byte-count accounting exact."""
    import shutil

    src = tempfile.mkdtemp(prefix="stream-inc-src-")
    wh = tempfile.mkdtemp(prefix="stream-inc-")
    cat = Catalog(spark, wh)
    all_ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    first = all_ev.filter(F.col("event_id") % 2 == 0)
    later = all_ev.filter(F.col("event_id") % 2 == 1)
    first.repartition(2).write.mode("overwrite").parquet(src)
    # drop Spark's _SUCCESS etc? file source reads part files only — fine

    def mk_stream():
        return S.file_stream(spark, src, S.EVENTS_SCHEMA).select(
            F.lit(0).cast("long").alias("cycle_id"),
            F.xxhash64("event_id").alias("url_hash"),
            F.lit("h").alias("host"),
            F.lit(200).alias("status"),
            F.col("ts").cast("timestamp").alias("fetched_at"),
            F.lit(1).cast("long").alias("bytes"),
        )

    ckpt = str(Path(wh) / "ckpt")
    q = S.manifest_sink(mk_stream(), cat, "fetch_log", ckpt).trigger(
        availableNow=True
    ).start()
    q.awaitTermination(120)
    n1 = cat.read("fetch_log").count()
    assert n1 == first.count()
    # the delta lands as new files (write to a temp dir, move parts in)
    tmp2 = tempfile.mkdtemp(prefix="stream-inc-delta-")
    later.repartition(2).write.mode("overwrite").parquet(tmp2)
    for i, p in enumerate(Path(tmp2).glob("part-*.parquet")):
        shutil.move(str(p), str(Path(src) / f"delta-{i}.parquet"))
    q2 = S.manifest_sink(mk_stream(), cat, "fetch_log", ckpt).trigger(
        availableNow=True
    ).start()
    q2.awaitTermination(120)
    n2 = cat.read("fetch_log").count()
    assert n2 == all_ev.count()  # exactly the delta, exactly once
    # the landed set is exactly the union (hash identity, no dup/miss)
    got = {
        r["url_hash"]
        for r in cat.read("fetch_log").select("url_hash").collect()
    }
    want = {
        r["h"] for r in all_ev.select(F.xxhash64("event_id").alias("h")).collect()
    }
    assert got == want
