"""Driver-contract query registry (SURVEY.md §2 coverage).

Each submodule exposes ``QUERIES: dict[name, fn(spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[name, sql]`` (DuckDB twin; omitted ⇒ rows-only
check). ``__spark_entry__`` aggregates them.

Parity rules used throughout (SURVEY.md §3.3):
- every computed column aliased identically in both engines;
- multi-row float aggregates rounded in-query (partial-agg order
  differs between engines);
- per-row float math NOT rounded where both engines accumulate
  sequentially in double (bit-exact);
- timestamps exported as epoch millis / formatted strings, session
  timezone pinned UTC.
"""

from __future__ import annotations

from . import crawlq, dedupq, relational, simq, streamq, textq

_MODULES = [relational, textq, dedupq, simq, streamq, crawlq]


def pin_session(spark) -> None:
    """Pin the runtime confs the oracle comparison depends on — the
    driver runs queries in ITS session, which may not share ours:
    UTC (timestamp formatting parity with DuckDB) and Arrow batching."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def all_queries():
    out = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
