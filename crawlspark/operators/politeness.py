"""Politeness operators: robots rules (C6) + crawl-delay token buckets (C7).

The reference enforces politeness imperatively — per-worker
`time.sleep(crawl_delay)` and per-site tube routing (SURVEY.md §2.1
C6/C7). Here both become declarative column math:

- robots: longest-prefix-match over `robots_rules`
  array<struct<allow,prefix>> expressed entirely with JVM higher-order
  array functions (filter / array_sort / element_at) — no Python UDF.
- token bucket: `tokens' = least(capacity, tokens + refill)`; a host
  may schedule ⌊tokens'⌋ URLs this cycle and carries the remainder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# longest matching prefix wins; empty match list ⇒ allowed (no rules hit)
ROBOTS_ALLOW_EXPR = """
coalesce(
  element_at(
    array_sort(
      filter(robots_rules, r -> startswith(path, r.prefix)),
      (a, b) -> CASE WHEN length(a.prefix) > length(b.prefix) THEN -1
                     WHEN length(a.prefix) < length(b.prefix) THEN 1
                     ELSE 0 END
    ),
  1).allow,
  true)
"""


def robots_allowed_col() -> Column:
    """Boolean column; requires `path` and `robots_rules` columns."""
    return F.expr(ROBOTS_ALLOW_EXPR)


def robots_filter(df: DataFrame, host_config: DataFrame) -> DataFrame:
    """Drop robots-disallowed rows. `host_config` is broadcast — hosts
    ≪ URLs always (the planner can't know that, so we hint)."""
    rules = host_config.select("host", "robots_rules", "site_priority")
    return (
        df.join(F.broadcast(rules), "host", "inner")
        .filter(robots_allowed_col())
        .drop("robots_rules")
    )


def refill_tokens(host_state: DataFrame, host_config: DataFrame) -> DataFrame:
    """host_state ⋈ host_config → refilled tokens + this cycle's cap."""
    return (
        host_state.join(
            F.broadcast(
                host_config.select("host", "token_capacity", "refill_per_cycle")
            ),
            "host",
            "inner",
        )
        .withColumn(
            "tokens_refilled",
            F.least(F.col("token_capacity"), F.col("tokens") + F.col("refill_per_cycle")),
        )
        .withColumn("cap", F.floor(F.col("tokens_refilled")).cast("int"))
        .select("host", "tokens_refilled", "cap")
    )
