"""P59 weighted sampling without replacement: the min-of-w-tickets
priority rule matches a sequential pure-Python twin exactly, weights
bias inclusion the right way, and the result is partitioning-invariant
with a shuffle-free pre-top-k plan."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from crawlspark.operators import textstats


def _pri_py(doc_id: int, w: int, salt: str = "wsr1") -> int:
    """Independent twin of the ticket rule: min over md5-60 draws."""
    return min(
        int(hashlib.md5(f"{salt}#{doc_id}#{j}".encode()).hexdigest()[:15], 16)
        for j in range(1, w + 1)
    )


def _docs(spark, n=300):
    # weight cycles 1..8 deterministically by id
    return spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") % 8 + 1).alias("w_raw")
    )


def test_matches_sequential_twin(spark):
    k = 25
    got = textstats.weighted_sample_wor(_docs(spark), "doc_id", "w_raw", k=k)
    rows = [(r["doc_id"], r["w"], r["priority"]) for r in got.collect()]
    exp_all = sorted(
        (_pri_py(i, i % 8 + 1), i) for i in range(300)
    )[:k]
    assert rows == [(i, i % 8 + 1, p) for (p, i) in exp_all]
    # without replacement: no doc twice, exactly k rows
    assert len({r[0] for r in rows}) == k


def test_weight_bias_and_clamp(spark):
    # expected inclusion scales with weight: among 300 docs the w=8
    # tier must land strictly more winners than the w=1 tier at k=100
    got = textstats.weighted_sample_wor(_docs(spark), "doc_id", "w_raw", k=100)
    by_w = {
        r["w"]: r["n"]
        for r in got.groupBy("w").agg(F.count("*").alias("n")).collect()
    }
    assert by_w.get(8, 0) > by_w.get(1, 0)
    # clamp: weights outside [1, w_max] tier into the rule's domain
    d = _docs(spark).withColumn("w_raw", F.col("w_raw") * 1000)
    clamped = textstats.weighted_sample_wor(d, "doc_id", "w_raw", k=10)
    assert {r["w"] for r in clamped.collect()} == {8}


def test_partitioning_invariant(spark):
    a = textstats.weighted_sample_wor(
        _docs(spark).repartition(1), "doc_id", "w_raw", k=30
    ).collect()
    b = textstats.weighted_sample_wor(
        _docs(spark).repartition(7), "doc_id", "w_raw", k=30
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def _strata_docs(spark, n=300):
    return _docs(spark, n).withColumn(
        "src", F.concat(F.lit("s"), (F.col("doc_id") % 4).cast("string"))
    )


def test_stratified_matches_sequential_twin(spark):
    """P60: per-stratum winners == the pure-Python twin's per-stratum
    (priority, id) prefixes, with identical priorities to P59's
    lottery (shared ticket rule) and exactly k rows per stratum."""
    k = 7
    got = textstats.stratified_weighted_sample(
        _strata_docs(spark), "doc_id", "src", "w_raw", k=k
    )
    rows = sorted(
        (r["stratum"], r["rank"], r["doc_id"], r["w"], r["priority"])
        for r in got.collect()
    )
    exp = []
    for s in range(4):
        members = sorted(
            (_pri_py(i, i % 8 + 1), i) for i in range(300) if i % 4 == s
        )[:k]
        exp += [
            (f"s{s}", rank, i, i % 8 + 1, p)
            for rank, (p, i) in enumerate(members, 1)
        ]
    assert rows == sorted(exp)
    per = {s: sum(1 for r in rows if r[0] == s) for s in {r[0] for r in rows}}
    assert set(per.values()) == {k}


def test_stratified_null_weight_degrades_to_one_ticket(spark):
    d = _strata_docs(spark).withColumn(
        "w_raw", F.when(F.col("doc_id") < 150, F.col("w_raw"))
    )
    got = textstats.stratified_weighted_sample(
        d, "doc_id", "src", "w_raw", k=5
    )
    null_side = got.filter(F.col("doc_id") >= 150).collect()
    assert all(r["w"] == 1 for r in null_side)


def test_stratified_two_phase_salted_plan(spark):
    """The per-stratum top-k must run the two-phase salted window —
    phase 1 partitioned by (stratum, salt) so a mega-stratum never
    serializes one task — with no Python eval."""
    got = textstats.stratified_weighted_sample(
        _strata_docs(spark), "doc_id", "src", "w_raw", k=5
    )
    p = got._jdf.queryExecution().executedPlan().toString()
    assert p.count("Window") >= 2, p
    assert "_s" in p, p  # the salted phase-1 partition key
    for marker in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct"):
        assert marker not in p, p


def test_plan_is_shuffle_free_topk(spark):
    """Priority math is narrow; the top-k is TakeOrderedAndProject —
    no Exchange, no sort-the-world, no Python eval in the plan."""
    got = textstats.weighted_sample_wor(_docs(spark), "doc_id", "w_raw", k=10)
    p = got._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p, p
    for marker in ("Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert marker not in p, p
