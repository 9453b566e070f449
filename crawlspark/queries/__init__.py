"""Driver-contract query registry (SURVEY.md §2 coverage).

Each submodule exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name, sql]`` (DuckDB twin; omitted ⇒ rows-only
check). ``__spark_entry__`` aggregates them.

Parity rules used throughout (SURVEY.md §3.3):
- every computed column aliased identically in both engines;
- multi-row float aggregates rounded in-query (partial-agg order
  differs between engines);
- per-row float math NOT rounded where both engines accumulate
  sequentially in double (bit-exact);
- timestamps exported as epoch millis / formatted strings, session
  timezone pinned UTC.
"""

from __future__ import annotations

from . import crawlq, dedupq, relational, simq, streamq, textq

_MODULES = [relational, textq, dedupq, simq, streamq, crawlq]

# Registration order: one query per distinct operator first (north-star
# crawl/streaming/similarity/dedup surfaces leading), redundant family
# variants after. Rationale and the recording-window context are
# documented in README.md ("Query registry ordering"); every entry —
# listed here or not — runs under tools/check_oracle.py, whose full
# per-round report is committed (BENCH/ORACLE_REPORT_r*.txt).
_WINDOW = [
    # crawl engine (C1–C19 composed; the north-star contract) + every
    # engine-feature contract: forget+cuckoo sidecar, time travel,
    # trap guard, redirects, reseed (C21, new r4), robots-declared
    # nested sitemaps (C26 ext, new r4), revisit/change-rates,
    # flat sitemaps, backoff, authority feedback, frame sampling —
    # the r3-tail crawl components rotate IN this round
    "q80_crawl_order", "q81_crawl_seen", "q82_crawl_docs",
    "q83_crawl_metrics",
    "q89_time_travel", "q78_reseed",
    "q79_sitemap_index",
    # C34 anti-starvation priority aging (q115, first hard row) takes
    # the slot of q85 pagerank (P16, hard r3 — the identical damped
    # iteration runs in-window inside q77's authority-fed priority
    # refresh, which composes operators/graph.pagerank)
    "q115_priority_aging",
    # C33 registered-domain politeness (q114, first hard row) takes
    # the slot of q88 forget/re-crawl (C20, hard r3 — the identical
    # forget + re-inject machinery runs in-window inside q78's
    # reseed contract, which composes forget())
    "q114_domain_politeness",
    "q71_revisit_versions", "q72_change_rates", "q73_sitemap_seen",
    "q76_backoff", "q77_priority_feedback", "q86_frame_sample",
    # late-r4 crawl-scope/politeness/economy contracts enter for their
    # first hard rows: C29/C30 depth-cap + URL deny patterns (q108),
    # C31 Crawl-delay-driven token refill (q109), C32 conditional
    # re-fetch economy (q110). They take the slots of q67 trap-guard
    # (C23) and q68 redirects (C24), both hard-green in r3 — the same
    # admission-point machinery (scope_filter sits exactly where
    # pattern_cap and robots rejection do) runs in-window via q108.
    "q108_crawl_scope", "q109_delay_politeness",
    "q110_conditional_fetch",
    # streaming S1–S9 (q94 streaming dedup rotated in r4; q97
    # stream-stream join and q107 stream-static enrichment are new r4)
    "q90_stream_window_rates", "q91_stream_sessions",
    "q93_crawl_stream_rates",
    "q94_stream_distinct", "q97_stream_join", "q107_stream_enrich",
    # P39 distributed BPE merge learning (q117, first hard row) takes
    # the slot of q92 stream token buckets (S5, hard r3 — the
    # streaming family keeps six in-window representatives
    # q90/q91/q93/q94/q97/q107; S5 stays full-registry-checked)
    "q117_bpe_merges",
    # P40 BPE apply/tokenize (q118, first hard row) takes the slot of
    # q52 near-dup pairs (P3, hard-green r1+r2+r3 — the identical
    # band self-join + exact-Jaccard-verify machinery runs in-window
    # inside q106's pair stage and q70's incremental probe)
    "q118_bpe_tokenize",
    # similarity P8 + P34: IVF coarse-quantizer and the new SQ8
    # int8-quantized scan (q105, first hard row). The band-OR LSH
    # variant (q63) rotates to the tail on its r3 hard row — the
    # banded-candidate + exact-re-rank machinery it exercised runs
    # in-window inside q64's probe/re-rank and q106's band join; the
    # exact baseline (q60) and single-table/multi-probe variants
    # (q61/q62) stay in the tail as before.
    "q64_ann_ivf", "q105_quantized_topk",
    # dedup P3→P17, P28 + the new P35 leakage-safe corpus split
    # (q106, first hard row — composes the q52 band join and q56
    # min-label clustering in-window) + the new P37 exact-substring
    # span dedup (q113, first hard row). The signature-intermediate
    # variants (q51/q53/q55) stay in the tail; q52 near-dup pairs
    # (P3, hard r1+r2+r3 — its band join + exact verify run in-window
    # inside q106/q70), q54 simhash pairs (P4/P5), q57 embedding
    # near-dups (P19), q59 chunk dedup (P25) and q56 clusters (P17 —
    # its min-label propagation runs in-window inside q106's
    # connected-components stage) rotate to the tail on their hard
    # rows.
    "q70_incremental_dedup", "q106_leakage_safe_split",
    "q113_span_dedup",
    # text/LLM pipeline. New r4 first-class components enter: P30
    # curation pipeline (q95 — which composes P9 lang-ID, P10 quality,
    # P11 token counting and P1 dedup in-window, letting their
    # dedicated queries q40/q41/q42 rotate to the tail with r2+r3 hard
    # rows), P31 TF-IDF (q99), R29 WARC export (q100). q43
    # fingerprinting rotates out on its r2+r3 hard rows.
    "q95_curation", "q99_tfidf", "q100_warc_export",
    # R31 WebDataset-style tar shard export (q119, first hard row —
    # hand-rolled-USTAR format differential) takes the slot of q48
    # LM-quality scoring (P22, hard r3 — its word-gram substrate and
    # partial-agg model machinery run in-window inside q46 repetition,
    # q47 contamination and q49 BM25)
    "q119_wds_shards",
    "q46_repetition", "q47_contamination",
    "q49_bm25", "q58_seq_packing",
    "q66_boilerplate", "q69_mixture", "q74_pii_scrub",
    "q75_shard_manifest",
    # P36 compression-ratio quality (q111, first hard row) takes the
    # slot of q65 exact percentiles (R25, hard-green r3; percentile
    # machinery stays full-registry-checked in the tail); P38
    # token-budgeted corpus selection (q116, first hard row —
    # distributed two-phase prefix sum) takes the slot of q84 media
    # features (P14, hard r3 — the identical multimodal decode
    # pipeline runs in-window inside q86's frame sampling)
    "q111_compression_quality", "q116_budget_select",
    # new late-r4 first-class components: P32 cross-document media
    # dedup over the interleaved payload (q102, refsim oracle) and
    # P33 domain-level quality with empirical-Bayes shrinkage (q103).
    # They take the slots of q03/q25 (hard-green r1/r2+r3; the
    # broadcast-join and as-of machinery they exercised stays
    # in-window inside q26/q96/q98 and the crawl queries)
    "q102_media_dedup", "q103_domain_quality",
    # relational representatives: R27 profiling, R28 skew join, and
    # the new R30 WARC ingestion round-trip (q112, first hard row —
    # it takes the slot of q26 bucketed anti-join, hard-green in BOTH
    # r2 and r3; the anti-join machinery runs in-window inside every
    # crawl query's seen filter). The relational rows hard-green in
    # both r2 and r3 (q03/q25 among them) are in the tail — still
    # full-registry-checked every round
    "q96_profile", "q98_skew_join", "q112_warc_roundtrip",
]


_SHIPPED_SESSIONS: set = set()


def _ship_package(spark) -> None:
    """Make `crawlspark` importable inside the session's Python
    WORKERS. The driver's own session may have been launched from a
    working directory that doesn't contain the repo — driver-side
    sys.path hacks don't propagate to workers, and every crawl/engine
    query ships pandas/Arrow UDFs that unpickle by importing
    crawlspark.* there. addPyFile at runtime is the sanctioned fix
    (it is also exactly what `spark-submit --py-files` would do)."""
    import os
    import tempfile
    import zipfile

    sid = id(spark.sparkContext)
    if sid in _SHIPPED_SESSIONS:
        return
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(), f"crawlspark_pyfiles_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for dirpath, _dirs, files in os.walk(pkg_dir):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, root))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # e.g. already added under another name — workers are fine
    _SHIPPED_SESSIONS.add(sid)


def pin_session(spark) -> None:
    """Pin the runtime confs the oracle comparison depends on — the
    driver runs queries in ITS session, which may not share ours:
    UTC (timestamp formatting parity with DuckDB) and Arrow batching.
    Also right-size shuffle parallelism + AQE for the sf0.01/sf0.1
    workloads (a stock session's 200 shuffle partitions just adds task
    overhead at this scale; results are partitioning-independent —
    tested across widths in tests/test_properties.py), and ship the
    package zip to the session's Python workers."""
    _ship_package(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # only right-size a stock session (200 = Spark's untouched default);
    # a deliberately tuned width — e.g. the determinism-across-widths
    # test, or an operator-provided conf — is left alone
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        try:
            cores = spark.sparkContext.defaultParallelism
        except Exception:
            cores = 32
        spark.conf.set("spark.sql.shuffle.partitions", str(max(8, min(64, cores))))


def _ordered(pooled: dict) -> dict:
    out = {}
    for name in _WINDOW:
        if name in pooled:
            out[name] = pooled[name]
    for name, v in pooled.items():
        if name not in out:
            out[name] = v
    return out


def all_queries():
    pooled = {}
    for m in _MODULES:
        pooled.update(m.QUERIES)
    return _ordered(pooled)


def all_oracles():
    pooled = {}
    for m in _MODULES:
        pooled.update(m.ORACLE)
        if hasattr(m, "build_oracle"):
            # refsim-generated oracles (crawl_oracle.py) are built at
            # call time — they write expectation parquet under /tmp
            pooled.update(m.build_oracle())
    return _ordered(pooled)
