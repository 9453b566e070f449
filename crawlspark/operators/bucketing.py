"""Bucketed co-located joins (SURVEY.md §4 'co-locate joins via
bucketing').

The manifest catalog partitions `url_seen` by `part = pmod(url_hash,P)`
(directory partitioning → partition pruning). Bucketing is the
complementary physical layout: rows hash-clustered *within* files by
join key, letting Spark's scan report a hash-partitioned output so the
C4 anti-join and C15 merge run WITHOUT shuffling the table side —
the moral equivalent of Iceberg's `bucket(N, url_hash)` transform.

Spark only honors bucket metadata through the session catalog
(`saveAsTable`), so these helpers manage bucketed *mirror* tables of
hot engine tables. At 10^10 URLs the url_seen mirror is the big win:
every cycle's candidate anti-join shuffles only the (small) candidate
side, never the 10^10-row seen set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int, sort: bool = True
) -> None:
    """Materialize df as a bucketed managed table (overwrite)."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a stale location from a previous process (in-memory catalog forgot
    # the table) blocks CREATE — clear it
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{table.lower()}", ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_anti_join(
    candidates: DataFrame, spark: SparkSession, seen_table: str, keys: list[str]
) -> DataFrame:
    """C4's exact check against a bucketed seen mirror: Spark shuffles
    only `candidates` into the table's bucket layout; the seen side is
    scan-local (no Exchange over it — asserted in tests/test_plans.py)."""
    seen = spark.table(seen_table)
    return candidates.join(seen.select(*keys), keys, "left_anti")
