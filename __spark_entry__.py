"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship broadcast-join aggregation on sf0.001;
``queries``/``oracle_sql`` expose the full operator surface from
SURVEY.md §2 (161 registry pairs; crawl-engine queries carry
refsim-generated DuckDB expectation oracles). Registration order is
the documented rotation discipline (README "Query registry
ordering"): the round-5 window leads with the 26 components earning
their first hard CORRECTNESS rows (q124–q153 families), then one
retained query per distinct component with the north-star crawl
surface first; redundant family variants and already-hard-row
contracts follow in the tail, all full-registry-checked per round.
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
