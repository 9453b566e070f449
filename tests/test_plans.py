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
