"""As-of (backward) join — Spark has no native ASOF JOIN (SURVEY.md
§2.2 R10), so this composes one from a union + running last_value
window: for each left row, attach the most recent right row with
right_ts <= left_ts for the same key.

Technique (all JVM, no Python): tag both sides, union, sort within key
by (ts, side) with right rows first at equal ts, then
last(payload, ignorenulls=True) over rows-unbounded-preceding. One
shuffle on the key — same cost as a sort-merge join — with none of the
row-explosion of the naive inequality-join formulation, so it holds at
10^9-row event streams.

Right-side ties (same key, same ts) are resolved BEFORE the join for
determinism: the max `tie_col` row wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """All left columns + `payload` columns from the latest right row
    with right_ts <= left_ts (null payload when no such row)."""
    if tie_col is not None:
        w_tie = Window.partitionBy(key, right_ts).orderBy(F.col(tie_col).desc())
        right = (
            right.withColumn("_rn", F.row_number().over(w_tie))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    rtypes = dict(right.dtypes)
    lcols = left.columns
    l = left.select(
        F.col(key).alias("_key"),
        F.col(left_ts).cast("timestamp").alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(rtypes[p]).alias(f"_p_{p}") for p in payload],
    )
    r = right.select(
        F.col(key).alias("_key"),
        F.col(right_ts).cast("timestamp").alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l.schema["_l"].dataType).alias("_l"),
        *[F.col(p).alias(f"_p_{p}") for p in payload],
    )
    w = (
        Window.partitionBy("_key")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = l.unionByName(r)
    filled = u.select(
        "_side",
        "_l",
        *[F.last(f"_p_{p}", ignorenulls=True).over(w).alias(p) for p in payload],
    )
    return filled.filter(F.col("_side") == 1).select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols], *payload
    )
