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

# Google-spec precedence: most specific matching rule (largest `spec`
# = rule-path length) wins, Allow wins ties; empty match list ⇒
# allowed. Plain rules match by prefix, wildcard rules by their
# compiled `pattern` regex — all JVM-side (filter / array_sort /
# regexp_like higher-order fns), no Python in the per-URL path.
ROBOTS_ALLOW_EXPR = """
coalesce(
  try_element_at(
    array_sort(
      filter(robots_rules,
             r -> CASE WHEN r.pattern IS NULL THEN startswith(path, r.prefix)
                       ELSE path RLIKE r.pattern END),
      (a, b) -> CASE WHEN a.spec > b.spec THEN -1
                     WHEN a.spec < b.spec THEN 1
                     WHEN a.allow AND NOT b.allow THEN -1
                     WHEN b.allow AND NOT a.allow THEN 1
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


def refill_tokens(
    host_state: DataFrame, host_config: DataFrame, cycle: int
) -> DataFrame:
    """host_state ⋈ host_config → refilled tokens + this cycle's cap.

    Refill is LAZY: `tokens` is the balance at `last_cycle` (post-
    spend) and the current balance is
    ``least(capacity, tokens + refill × (cycle − last_cycle))``.
    This is exactly the per-cycle iterated refill — for r ≥ 0,
    ``least(cap, least(cap, t+r) + r) == least(cap, t+2r)`` by
    induction — but lets the engine write host_state rows only for
    hosts that actually spend, instead of rewriting 10^8 hosts every
    cycle."""
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
            F.least(
                F.col("token_capacity"),
                F.col("tokens")
                + F.col("refill_per_cycle")
                * (F.lit(cycle) - F.col("last_cycle")).cast("double"),
            ),
        )
        .withColumn("cap", F.floor(F.col("tokens_refilled")).cast("int"))
        .select("host", "tokens_refilled", "cap")
    )


def latest_host_state(host_state: DataFrame) -> DataFrame:
    """Resolve the append-only host_state delta log to current state:
    newest `last_cycle` per host wins (each cycle writes at most one
    delta per host, so the order is total). One small shuffle over the
    hosts table — traded against rewriting every host row per cycle."""
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(F.col("last_cycle").desc())
    return (
        host_state.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def backoff_caps(sched: DataFrame, host_config: DataFrame) -> DataFrame:
    """C27 adaptive politeness backoff: per-host fetch failure rate
    over the attempt log → the next per-cycle token cap, by exact
    rule (≥ 1/4 of attempts failed → halve the cap, floor 1.0; else
    keep). A host throwing errors is a host asking to be crawled
    slower — the 429/5xx backoff a live crawler must implement. Feed
    the result through ``CrawlEngine.update_politeness`` (new
    host_config with ``new_cap`` as token_capacity) to apply mid-crawl.

    Scale shape: one partial-aggregated groupBy over the scheduled
    log + a broadcast join on the per-host config — a rare maintenance
    scan like revisit(), never per-cycle."""
    agg = sched.groupBy("host").agg(
        F.count("*").cast("long").alias("n_attempts"),
        F.sum((~F.col("ok")).cast("int")).cast("long").alias("n_fail"),
    )
    hc = host_config.select("host", F.col("token_capacity").alias("cap"))
    return agg.join(F.broadcast(hc), "host").select(
        "host", "n_attempts", "n_fail",
        F.round(F.col("n_fail") / F.col("n_attempts"), 6).alias("fail_ratio"),
        "cap",
        F.when(
            4 * F.col("n_fail") >= F.col("n_attempts"),
            F.greatest(F.lit(1.0), F.col("cap") / 2),
        )
        .otherwise(F.col("cap"))
        .alias("new_cap"),
    )


def scope_filter(df: DataFrame, g) -> DataFrame:
    """C29/C30 crawl-scope controls, applied at the same admission
    point as robots rejection: depth cap (drop candidates deeper than
    g.max_depth hops from the seeds) and URL deny patterns (JVM
    `rlike` over url_norm; patterns restricted to the Java∩RE2∩Python
    regex subset so the refsim's `re.search` twin decides
    identically). Both knobs default off — this is then the identity
    and adds nothing to the plan."""
    if g.max_depth is not None:
        df = df.filter(F.col("depth") <= F.lit(g.max_depth))
    for p in g.url_deny:
        df = df.filter(~F.col("url_norm").rlike(p))
    return df
