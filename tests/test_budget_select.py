"""P38 token-budgeted corpus selection (q116): the distributed
two-phase prefix sum must equal the sequential greedy prefix exactly,
stay partitioning-invariant, and honor the budget boundary (the first
overflowing doc and everything after it is excluded).
"""

from pyspark.sql import functions as F

from crawlspark.operators import textstats


ROWS = [
    # (id, quality, cost) — quality ties break on id
    ("d0", 0.9, 40),
    ("d1", 0.9, 25),
    ("d2", 0.7, 50),
    ("d3", 0.7, 10),
    ("d4", 0.5, 30),
    ("d5", 0.3, 5),
]


def _expect(budget):
    out, cum = [], 0
    for i, q, c in sorted(ROWS, key=lambda r: (-r[1], r[0])):
        cum += c
        if cum <= budget:
            out.append((i, q, c, cum))
    return out


def _run(spark, budget, parts):
    df = spark.createDataFrame(ROWS, ["id", "q", "cost"]).repartition(parts)
    got = textstats.budget_select(df, "id", "q", "cost", budget).collect()
    return sorted((r["id"], r["q"], r["cost"], r["cum_cost"]) for r in got)


def test_matches_sequential_greedy_prefix(spark):
    for budget in (0, 64, 65, 100, 1000):
        assert _run(spark, budget, 3) == _expect(budget), budget


def test_partitioning_invariant(spark):
    assert _run(spark, 100, 1) == _run(spark, 100, 7) == _expect(100)
