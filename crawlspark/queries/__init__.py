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
    # crawl engine (C1–C19 composed; the north-star contract), plus
    # the engine-feature contracts: q88 forget()+cuckoo sidecar, q89
    # snapshot time travel (both refsim-oracle-checked)
    "q80_crawl_order", "q81_crawl_seen", "q82_crawl_docs",
    "q83_crawl_metrics", "q84_media_features", "q85_pagerank",
    "q88_forget_recrawl", "q89_time_travel", "q67_trap_guard",
    "q68_redirects",
    # streaming S1–S6, plus the crawl-stream wrapper (S1 applied to
    # the engine's own frontier/metrics deltas)
    "q90_stream_window_rates", "q91_stream_sessions",
    "q92_stream_token_buckets", "q93_crawl_stream_rates",
    # similarity P7–P8: one slot per distinct method — exact baseline,
    # band-OR LSH (the production recall config), IVF coarse-quantizer.
    # The single-table LSH (q61) and multi-probe (q62) variants stay
    # registered in the tail.
    "q60_cosine_topk", "q63_ann_banded", "q64_ann_ivf",
    # dedup P1–P6, P17 + embedding-cosine near-dups (q57)
    "q56_dedup_clusters", "q50_exact_dedup", "q51_minhash_sig",
    "q52_near_dup_pairs", "q53_simhash", "q54_simhash_pairs",
    "q55_chargram_pairs", "q57_embed_near_dups",
    # text pipeline P9–P13 + LM-quality scoring (P22), paragraph/chunk
    # dedup (P25), exact percentiles (R25)
    "q40_token_stats", "q41_quality", "q42_lang_id", "q43_fingerprint",
    "q44_media_meta", "q48_lm_quality", "q59_chunk_dedup",
    "q65_percentiles",
    # relational surface, one per operator (R1–R23 + §2.3 families)
    "q01_pricing_summary", "q03_revenue_by_nation",
    # (tail moves, each §2 row still evidenced in-window — rationale
    # per-query in README "Query registry ordering": q02→q28/q29
    # project/cast, q04→q01 hash agg, q05→q26 anti join, q17→q30
    # array HOFs, q07→q03 shuffle join, q06/q09/q19 from r2)
    "q08_region_status_grid", "q10_group_families",
    "q12_top_orders_per_cust", "q13_running_total", "q14_topk_orders",
    "q15_setops", "q18_doc_pivot",
    "q20_json_props", "q25_asof_orders", "q26_bucketed_antijoin",
    "q28_string_funcs", "q29_date_funcs", "q30_array_funcs",
    "q31_map_funcs", "q35_semi_scan",
    # (q32 conditionals → tail: CASE/if expressions run in-window
    # inside q42's language-ID argmax chain)
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
