"""Physical-plan audits (SURVEY.md §4): the optimizations the engine
relies on must actually appear in the plans — predicate pushdown to
parquet, column pruning, broadcast joins for host-state dims, no
cartesian products in the hot path, and whole-stage codegen spans."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from crawlspark.engine import CrawlEngine, EngineConfig
from crawlspark.queries.relational import (
    q02_filter_project,
    q03_revenue_by_nation,
    q12_top_orders_per_cust,
)
from crawlspark.synth import UNIT

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_and_pruning(spark):
    p = plan_of(q02_filter_project(spark, SF))
    assert "PushedFilters: [" in p and "l_returnflag" in p.split("PushedFilters")[1][:200]
    # column pruning: the scan must not read the full lineitem schema
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_shipdate" not in read_schema and "l_suppkey" not in read_schema


def test_dim_joins_are_broadcast(spark):
    p = plan_of(q03_revenue_by_nation(spark, SF))
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_window_topk_single_shuffle(spark):
    p = plan_of(q12_top_orders_per_cust(spark, SF))
    # one exchange for the window partitioning, nothing quadratic
    assert p.count("Exchange") <= 2
    assert "CartesianProduct" not in p


def _cycle_batch_plan(eng, spark, keys=("url_hash", "url_norm")):
    """Build the exact queued→capped→batch dataflow run_cycle uses
    (working-state reads: frontier ANTI resolved ⟕ retry, lazy-refilled
    host_state deltas)."""
    from pyspark.sql import functions as FF

    from crawlspark.operators import politeness, schedule

    snap = eng.cat.current_snapshot()
    frontier = eng.cat.read("frontier", snap)
    resolved = eng.cat.read("resolved", snap)
    retry = eng.cat.read("retry_state", snap)
    host_state = eng.cat.read("host_state", snap)
    hc = eng.cat.read("host_config", snap)
    queued = (
        frontier.join(resolved.select(*keys), list(keys), "left_anti")
        .join(retry, list(keys), "left")
        .withColumn("attempt", (FF.coalesce("n_fail", FF.lit(0)) + 1).cast("int"))
        .drop("n_fail")
    )
    hs_ref = politeness.refill_tokens(
        politeness.latest_host_state(host_state), hc, cycle=2
    )
    return schedule.global_schedule(
        schedule.per_host_cap(queued, hs_ref.select("host", "cap")), UNIT.batch_size
    )


def test_cycle_plan_shape(spark):
    """The scheduled-batch plan of a real cycle: anti-join + broadcast
    politeness joins, filters pushed to the frontier scan, whole-stage
    codegen present — and NO scan of the unbounded history logs
    (`scheduled`, `edges`, `fetch_log`): per-cycle input must stay ∝
    working state, not total crawl history."""
    eng = CrawlEngine(spark, EngineConfig(graph=UNIT, warehouse=tempfile.mkdtemp()))
    eng.bootstrap()
    eng.run_cycle(1)
    batch = _cycle_batch_plan(eng, spark)
    p = plan_of(batch)
    assert "LeftAnti" in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "PushedFilters" in p
    # the scale invariant: no history-log directory feeds the cycle plan
    for history_table in ("/scheduled/", "/edges/", "/fetch_log/"):
        assert history_table not in p, f"cycle plan scans history log {history_table}"
    # whole-stage codegen: AQE wrappers hide codegen pre-execution, so
    # audit the same plan shape with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        batch2 = _cycle_batch_plan(eng, spark)
        pc = batch2._jdf.queryExecution().executedPlan().toString()
        assert "*(" in pc  # `*(N)` = WholeStageCodegen span marker
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_assign_seq_distributed_no_global_window(spark):
    """C18 at production batch sizes: the distributed two-phase rank
    must contain no partitionBy-less window (single-task funnel) and
    must equal the single-window path exactly."""
    from pyspark.sql import functions as FF

    from crawlspark.operators import schedule

    novel = spark.range(5000).select(
        (F.col("id") % 100).alias("batch_pos"),
        ((F.col("id") / 100).cast("long") % 10).alias("span_pos"),
        (F.col("id") / 1000).cast("long").alias("link_pos"),
        F.concat(F.lit("http://h/p"), F.col("id").cast("string")).alias("url_norm"),
    )
    small = schedule.assign_seq(novel, 1000, distributed=False)
    big = schedule.assign_seq(novel, 1000, distributed=True)
    # No single-partition exchange anywhere in the distributed plan:
    # the rank windows partition by _pid, never by the empty spec
    p = big._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in p, p
    a = {r["url_norm"]: r["seq"] for r in small.collect()}
    b = {r["url_norm"]: r["seq"] for r in big.collect()}
    schedule.release_scratch()
    assert a == b


def test_bucketed_seen_join_shuffles_only_candidates(spark):
    """Bucketed url_seen mirror: the anti-join plan must contain no
    Exchange on the seen-table side (bucket layout satisfies the join's
    distribution), only on the candidate side."""
    from pyspark.sql import functions as F

    from crawlspark.operators import bucketing

    seen_df = spark.range(50000).select(
        F.xxhash64("id").alias("url_hash"),
        F.concat(F.lit("http://h/p"), F.col("id").cast("string")).alias("url_norm"),
    )
    bucketing.write_bucketed(seen_df, "url_seen_bucketed", "url_hash", 8)
    cand = spark.range(3000).select(
        F.xxhash64((F.col("id") * 2).cast("string")).alias("url_hash"),
        F.lit("u").alias("url_norm"),
    )
    out = bucketing.colocated_anti_join(cand, spark, "url_seen_bucketed", ["url_hash"])
    out.collect()

    # at 10^10 rows the seen side can never broadcast — model that by
    # disabling the broadcast threshold so the planner shows the
    # bucket-aware sort-merge shape
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out2 = bucketing.colocated_anti_join(
            cand, spark, "url_seen_bucketed", ["url_hash"]
        )
        plan = out2._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    # exactly one Exchange (the candidate side); seen side reads
    # bucketed files directly
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan


def test_ivf_plan_jvm_only_with_broadcast_centroids(spark):
    """q64's physical plan: centroid assignment must broadcast the
    (tiny) centroid table — never shuffle the corpus for it — and the
    whole IVF path must contain zero Python/Arrow stages (all math is
    JVM higher-order array functions)."""
    from crawlspark.operators import similarity
    from crawlspark.queries.relational import T

    sf = "/root/testdata/sf0.001"
    e = T(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    corpus = e.filter(F.col("vec_id") >= 5)
    out = similarity.ann_topk_ivf(q, corpus, spark, k=3, n_cells=8,
                                  n_probe=2, sample_per_cell=16, dim=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapCoGroupsInPandas",
                   "MapInPandas"):
        assert marker not in plan, marker


def test_shingle_split_bound_once(spark):
    """The words array must be bound to a column before the shingle
    transform: an inline `shingles(words(text))` re-evaluates
    split(trim(text)) inside the lambda for every element_at call —
    O(words²) per document (measured 6× on the bench corpus). Exactly
    one split per plan."""
    from crawlspark.operators import dedup
    from crawlspark.queries.relational import T

    d = T(spark, "/root/testdata/sf0.001", "documents")
    for df in (
        dedup.shingle_table(d, "doc_id", "text", 2),
        dedup.simhash(d, "doc_id", "text", nbits=8, token_k=2),
    ):
        p = df._jdf.queryExecution().optimizedPlan().toString()
        assert p.count("split(") == 1, p


def test_lang_id_zero_shuffles(spark):
    """P9 language-ID is pure column math: one split, no Exchange, no
    join, no Python stage — the whole prediction happens inside the
    scan's project."""
    from crawlspark.operators import textstats
    from crawlspark.queries.relational import T

    d = T(spark, "/root/testdata/sf0.001", "documents")
    out = textstats.lang_id(d, "doc_id", "text", spark)
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("split(") == 1, opt
    phys = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("Exchange", "Join", "BatchEvalPython", "ArrowEvalPython"):
        assert marker not in phys, phys


def test_repetition_signals_shuffle_free(spark):
    """q46 (P20): per-doc repetition stats must stay narrow — pure
    column math, zero exchanges, zero Python stages."""
    from crawlspark.queries.textq import q46_repetition

    p = plan_of(q46_repetition(spark, SF))
    assert "Exchange" not in p
    assert "EvalPython" not in p


def test_contamination_broadcasts_benchmark(spark):
    """q47 (P21): the benchmark gram set must BROADCAST (evals are
    tiny by definition); the corpus side is explode + partial-agg
    distinct count — bounded shuffles, no sort-merge, no cartesian,
    no Python."""
    import re

    from crawlspark.queries.textq import q47_contamination

    p = plan_of(q47_contamination(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    shuffles = [l for l in p.splitlines() if re.match(r"^\(\d+\) Exchange", l)]
    # bench-gram distinct + the two-phase per-doc distinct count
    assert len(shuffles) <= 3, shuffles


def test_chunk_dedup_partial_agg_no_window(spark):
    """q59 (P25): the corpus-wide keep-first must be a partial-
    aggregated min(struct) — a hot boilerplate chunk then combines
    map-side instead of funneling into one window partition — and the
    whole pipeline stays JVM-side with exactly the two shuffles the
    semantics require (chunk_key agg, doc reassembly)."""
    import re

    from crawlspark.queries.dedupq import q59_chunk_dedup

    p = plan_of(q59_chunk_dedup(spark, SF))
    assert "Window" not in p
    assert "EvalPython" not in p
    assert "partial_min" in p or "Keys: [k" in p  # partial agg on the key
    shuffles = [l for l in p.splitlines() if re.match(r"^\(\d+\) Exchange", l)]
    assert len(shuffles) <= 2, shuffles


def test_mixture_sample_narrow_zero_shuffles(spark):
    """q69 (P27): the mixture resample must stay narrow — weight
    lookup is a literal CASE (no join), the keep decision is column
    math, the copy explode is per-row; zero exchanges, zero Python."""
    from crawlspark.queries.textq import q69_mixture

    p = plan_of(q69_mixture(spark, SF))
    assert "Exchange" not in p
    assert "EvalPython" not in p
    assert "Join" not in p


def test_boilerplate_partial_agg_no_window(spark):
    """q66 (P26): the within-host DF table must be partial-aggregated
    groupBys (a 10^6-page banner combines map-side), never a window;
    the scoring join is a plain equi-join — no cartesian, no Python."""
    from crawlspark.queries.textq import q66_boilerplate

    p = plan_of(q66_boilerplate(spark, SF))
    assert "Window" not in p
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p
    assert "partial_count" in p or "partial" in p.lower()


def test_incremental_dedup_probes_index_no_corpus_rescan(spark):
    """P28: with a PRE-BUILT corpus band index, the candidate probe
    must join delta keys against the index — corpus TEXT is read only
    for the candidate semi-join in the verify stage, and nothing is
    quadratic or Python-side."""
    from crawlspark.operators import dedup
    from crawlspark.queries.relational import T

    d = T(spark, "/root/testdata/sf0.001", "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    delta = d.limit(50).select(
        F.concat(F.lit("new-"), F.col("doc_id")).alias("doc_id"), "text"
    )
    idx = dedup.band_keys(
        dedup.minhash_signatures(
            dedup.shingle_table(d, "doc_id", "text", 2), 8
        ),
        8, 4,
    )
    out = dedup.incremental_near_dups(
        delta, d, "doc_id", "text", corpus_index=idx
    )
    p = plan_of(out)
    assert "CartesianProduct" not in p
    assert "EvalPython" not in p
    assert "Window" not in p


def test_pattern_cap_two_phase_salted_windows(spark):
    """C23: the trap-guard cap must run as the two-phase salted window
    — phase 1 partitioned by (host, path, host_salt) so one hot
    pattern never serializes a single window partition, phase 2 by
    (host, path) over the bounded survivors — and the prior join must
    not broadcast-assume or go quadratic."""
    from crawlspark.operators import schedule

    novel = spark.range(100).select(
        F.lit("h").alias("host"), F.lit("/p").alias("path"),
        (F.col("id") % 8).cast("int").alias("host_salt"),
        F.col("id").alias("batch_pos"),
        F.lit(0).alias("span_pos"), F.lit(0).alias("link_pos"),
    )
    prior = spark.createDataFrame(
        [("h", "/p", 1)], "host string, path string, n_admitted long"
    )
    import re

    p = plan_of(schedule.pattern_cap(novel, prior, 3))
    windows = [l for l in p.splitlines() if re.match(r"^\(\d+\) Window", l)]
    assert len(windows) == 2, p
    # phase 1 (the deeper node, listed first in the details) salts
    first_detail = p.split(windows[0])[1]
    assert "host_salt" in first_detail.split("(")[0] + first_detail[:400]
    assert "CartesianProduct" not in p


def test_q48_plan_is_pure_partial_agg(spark):
    """q48 (r4 rewrite): the LM-quality plan must be hash aggregates +
    one join over the materialized gram tables — no per-doc
    collect_list/sort_array fold (the r3 shape's cost), no cartesian
    product, and the final rollup's aggregate expressions are plain
    long sums."""
    from crawlspark.queries.textq import q48_lm_quality

    p = plan_of(q48_lm_quality(spark, SF))
    assert "collect_list" not in p and "sort_array" not in p
    assert "CartesianProduct" not in p
    assert "HashAggregate" in p


def test_media_dedup_partial_agg_no_window(spark):
    """q102 (P32): the cross-document media dedup must pick its
    canonical keeper via a partial-aggregated min(struct) — a
    corpus-hot logo ref then combines map-side instead of funneling
    one window partition — with the whole pipeline JVM-side."""
    from pyspark.sql import types as T

    from crawlspark.schemas import SPAN
    from tests.test_domain_media import _media_dedup

    schema = T.StructType([
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ])
    df = spark.createDataFrame(
        [("d1", [("media", "", "media://a/1", 10)])], schema
    )
    p = plan_of(_media_dedup(df))
    assert "Window" not in p
    assert "EvalPython" not in p
    assert "CartesianProduct" not in p


def test_domain_quality_broadcast_prior_partial_agg(spark):
    """q103 (P33): the corpus prior must enter the plan as a BROADCAST
    scalar row (never a shuffle against the domain table), the
    per-source rollup must be a partial hash aggregate over integer
    sums, and nothing leaves the JVM."""
    import re

    from crawlspark.operators import textstats

    df = spark.createDataFrame(
        [("text here", f"s{i % 3}") for i in range(30)],
        "text string, source string",
    )
    p = plan_of(textstats.domain_quality(df))
    assert "BroadcastNestedLoopJoin" in p  # 1-row prior, broadcast side
    assert "EvalPython" not in p
    assert "Window" not in p
    # exactly the two aggregation shuffles the semantics require
    # (per-source, global) — plus AQE bookkeeping at most
    shuffles = [l for l in p.splitlines() if re.match(r"^\(\d+\) Exchange", l)]
    assert len(shuffles) <= 2, shuffles


def test_classifier_filter_plan_is_narrow_jvm(spark):
    """P10 classifier inference (q123): zero Python stages, exactly one
    shuffle (the partial-aggregated groupBy(id)), weight lookup inlined
    as a literal — the plan that scales to a 100 TB corpus scan."""
    from crawlspark.operators.textstats import classifier_filter

    df = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(classifier_filter(df, "doc_id", "text", dims=64))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # formatted plans list each node twice (tree + detail): one
    # physical Exchange == 2 occurrences
    assert p.count("Exchange") <= 2
    assert "HashAggregate" in p


def test_bpe_apply_plan_is_vocab_sided(spark):
    """P40 apply (q118): the merge replaces must sit on the vocab side
    (after the word-frequency aggregate), never per corpus row — the
    plan shows the replace chain above a HashAggregate, no Python."""
    from crawlspark.operators.textstats import bpe_apply

    df = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(bpe_apply(df, "text", [("a", "b"), ("ab", "c")]))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "replace" in p and "HashAggregate" in p
    # corpus scan feeds ONE aggregate before the replace chain: the
    # replace expression must appear above the word-freq aggregation,
    # i.e. the project containing it reads the aggregated 'word'
    # column, not the raw text scan output
    seg = p.split("replace")[0]
    assert seg.count("HashAggregate") >= 1


def test_epoch_shuffle_plan_jvm_only(spark):
    """P50 (q135): the shuffle-key derivation and per-epoch rank are
    pure JVM — no Python stages, no cartesian products; the explode
    is a narrow Generate above the scan."""
    from crawlspark.operators.textstats import epoch_shuffle

    df = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(epoch_shuffle(df, "doc_id", n_epochs=4))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    assert "Generate" in p and "Window" in p


def test_phrase_search_filters_postings_before_join(spark):
    """P52 (q137): each phrase term must prune the postings to ONE
    term's list BEFORE the positional join — the plan shows term
    equality filters below the join, no Python, no cartesian."""
    from crawlspark.operators.textstats import phrase_occurrences, positional_index

    df = spark.read.parquet(f"{SF}/documents.parquet")
    post = positional_index(df, "doc_id", "text")
    p = plan_of(phrase_occurrences(post, ["alpha", "beta"]))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "CartesianProduct" not in p
    # both single-term filters exist as plan predicates
    assert p.count("= alpha") >= 1 and p.count("= beta") >= 1


def test_prefix_filter_no_cartesian_and_partial_agg(spark):
    """P49 (q134): candidate generation is an equi-join on the shingle
    key (plus size inequality) — never a cartesian product — and the
    df/size tables are partial-aggregated HashAggregates."""
    from crawlspark.operators import dedup

    df = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    sh = dedup.shingle_table(df, "doc_id", "text", k=2)
    p = plan_of(dedup.prefix_filter_candidates(sh, t_num=3, t_den=5))
    assert "CartesianProduct" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "HashAggregate" in p


def test_dsir_plan_jvm_partial_agg(spark):
    """P55 DSIR (q140): zero Python stages; per-(doc,bucket) counts and
    both bucket models are partial-aggregated HashAggregates, and the
    final rollup is a long-sum groupBy(id) — no windows, no sorts of
    data-scale frames."""
    from crawlspark.operators.textstats import dsir_weights

    df = spark.read.parquet(f"{SF}/documents.parquet")
    p = plan_of(dsir_weights(df, "doc_id", "text",
                             F.col("source") == "src0", dims=64))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "HashAggregate" in p
    assert "CartesianProduct" not in p and "Window" not in p


def test_html_extract_and_line_filter_zero_shuffles(spark):
    """P56/P57 (q141/q142): pure narrow column math — no Exchange, no
    Python, linear in corpus bytes."""
    from crawlspark.operators.textstats import html_to_text, line_quality_filter

    df = spark.read.parquet(f"{SF}/documents.parquet")
    ext = df.select(
        "doc_id", html_to_text(F.col("text")).alias("t")
    )
    p = plan_of(line_quality_filter(ext, "doc_id", "t"))
    assert "Exchange" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_semantic_dedup_pairs_join_on_cell(spark):
    """P54 SemDeDup (q139): the quantizer assignment is a broadcast
    over the tiny centroid set and the duplicate pairs join strictly
    on `cell` — never an unkeyed all-pairs product."""
    from crawlspark.operators.similarity import semantic_dedup

    from crawlspark.operators.similarity import ivf_assign, ivf_centroids

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    p = plan_of(semantic_dedup(emb, n_cells=8, dim=64))
    assert "CartesianProduct" not in p
    # the pair join is keyed (hash/sort-merge on cell), not a product
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p
    )
    # the assignment stage (behind the checkpoint boundary in the
    # composed plan) broadcasts the tiny centroid set — the crossJoin
    # is a BroadcastNestedLoopJoin, never a shuffled product
    cents = ivf_centroids(emb, 8, 24, dim=64)
    pa = plan_of(
        ivf_assign(
            emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")),
            cents, n_probe=1,
        )
    )
    assert "BroadcastNestedLoopJoin" in pa
    assert "CartesianProduct" not in pa
