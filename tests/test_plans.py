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


def test_cycle_plan_shape(spark):
    """The scheduled-batch plan of a real cycle: anti-join + broadcast
    politeness joins, filters pushed to the frontier scan, and
    whole-stage codegen present."""
    eng = CrawlEngine(spark, EngineConfig(graph=UNIT, warehouse=tempfile.mkdtemp()))
    eng.bootstrap()
    eng.run_cycle(1)
    snap = eng.cat.current_snapshot()
    frontier = eng.cat.read("frontier", snap)
    scheduled_log = eng.cat.read("scheduled", snap)
    host_state = eng.cat.read("host_state", snap)
    hc = eng.cat.read("host_config", snap)
    from crawlspark.operators import politeness, schedule

    queued = frontier.join(
        scheduled_log.select("url_hash", "url_norm"), ["url_hash", "url_norm"], "left_anti"
    )
    hs_ref = politeness.refill_tokens(host_state, hc)
    batch = schedule.global_schedule(
        schedule.per_host_cap(queued, hs_ref.select("host", "cap")), UNIT.batch_size
    )
    p = plan_of(batch)
    assert "LeftAnti" in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "PushedFilters" in p
    # whole-stage codegen: AQE wrappers hide codegen pre-execution, so
    # audit the same plan shape with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        queued2 = frontier.join(
            scheduled_log.select("url_hash", "url_norm"), ["url_hash", "url_norm"], "left_anti"
        )
        batch2 = schedule.global_schedule(
            schedule.per_host_cap(queued2, hs_ref.select("host", "cap")), UNIT.batch_size
        )
        pc = batch2._jdf.queryExecution().executedPlan().toString()
        assert "*(" in pc  # `*(N)` = WholeStageCodegen span marker
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


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
