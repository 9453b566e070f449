"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship broadcast-join aggregation on sf0.001;
``queries``/``oracle_sql`` expose the full operator surface from
SURVEY.md §2. Registration order leads with the north-star surfaces —
crawl engine (q80–q85; rows-only, semantics oracle-checked against the
pure-Python refsim in tests/), streaming (q90–q92), similarity
(q60/q61/q63), dedup clustering (q56) — then dedup (q50–q55), text
analysis (q40–q44), and one relational query per operator, so the
correctness harness's recording window covers every distinct
capability; redundant relational family variants follow after.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from crawlspark.queries.relational import q03_revenue_by_nation

    return q03_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from crawlspark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from crawlspark.queries import all_oracles

    return all_oracles()
