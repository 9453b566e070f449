"""Structured Streaming surface (SURVEY.md §2.4).

The reference is a continuously-running queue consumer; the north rule
recasts it as batch micro-cycles (engine.py). This module exposes the
equivalent *streaming* operator surface over the same tables so the
engine's semantics compose with live feeds:

  S1  file-source stream (frontier deltas / fetch-log / events replay)
  S2  watermark + late-data drop
  S3  tumbling/sliding window aggregation (fetch-rate dashboards)
  S4  session windows (per-host activity sessions)
  S5  custom stateful op — live per-host crawl-delay token buckets via
      applyInPandasWithState (the streaming twin of operators/politeness)
  S6  exactly-once sink — foreachBatch + the catalog's atomic manifest
      commit keyed by (epoch, table); replays of an epoch are no-ops

Batch/stream parity is tested with trigger(availableNow) against the
equivalent batch aggregation (tests/test_streaming.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def file_stream(spark: SparkSession, path: str, schema: T.StructType,
                max_files_per_trigger: int | None = None) -> DataFrame:
    """S1: parquet file-source stream with a pinned schema (never
    inferred — schema drift must fail loudly, not silently re-plan)."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def windowed_rates(stream: DataFrame, ts_col: str = "ts",
                   key_col: str = "event_type",
                   window: str = "5 minutes", slide: str | None = None,
                   watermark: str = "10 minutes") -> DataFrame:
    """S2+S3: watermarked tumbling (or sliding) event-time counts —
    the streaming fetch-rate dashboard. Late rows beyond the watermark
    are dropped, bounding state."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.unix_timestamp("win.start").alias("win_start"),
            key_col,
            "n",
            "sum_value",
        )
    )


def session_counts(stream: DataFrame, ts_col: str = "ts",
                   key_col: str = "user_id", gap: str = "30 minutes",
                   watermark: str = "1 hour") -> DataFrame:
    """S4: gap-based session windows per key."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.unix_timestamp("sess.start").alias("sess_start"),
            F.unix_timestamp("sess.end").alias("sess_end"),
            "n_events",
        )
    )


# -- S5: live token buckets ------------------------------------------------

TOKEN_STATE = T.StructType(
    [
        T.StructField("tokens", T.DoubleType()),
        T.StructField("capacity", T.DoubleType()),
        T.StructField("refill_per_batch", T.DoubleType()),
    ]
)

TOKEN_OUT = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("requested", T.LongType()),
        T.StructField("allowed", T.LongType()),
        T.StructField("tokens_left", T.DoubleType()),
    ]
)


def make_token_bucket_fn(capacity: float, refill: float):
    """Streaming twin of operators/politeness.refill_tokens: per-host
    state carries the token balance across micro-batches; each batch
    may fetch ⌊tokens⌋ of its requested URLs."""

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.exists:
            tokens, cap, per = state.get
        else:
            tokens, cap, per = capacity, capacity, refill
        requested = 0
        for pdf in pdfs:
            requested += len(pdf)
        tokens = min(cap, tokens + per)
        allowed = min(int(tokens), requested)
        tokens -= allowed
        state.update((float(tokens), float(cap), float(per)))
        yield pd.DataFrame(
            {
                "host": [host],
                "requested": [requested],
                "allowed": [allowed],
                "tokens_left": [float(tokens)],
            }
        )

    return fn


def token_bucket_stream(requests: DataFrame, capacity: float = 8.0,
                        refill: float = 4.0) -> DataFrame:
    """S5: apply the stateful token bucket to a stream of fetch
    requests carrying a `host` column."""
    return requests.groupBy("host").applyInPandasWithState(
        make_token_bucket_fn(capacity, refill),
        outputStructType=TOKEN_OUT,
        stateStructType=TOKEN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- S1 over the engine's own tables: the streaming crawl wrapper ----------

def crawl_schedule_stream(spark: SparkSession, warehouse: str,
                          max_files_per_trigger: int | None = None) -> DataFrame:
    """Tail the crawl engine's `scheduled` log as a stream: every cycle
    commit adds one data directory under the manifest warehouse, and
    the parquet file source discovers its files incrementally — a live
    feed of fetch attempts without touching the engine's hot path.
    (The glob covers all staged dirs; schema pinned to SCHEDULED.)"""
    from .schemas import SCHEDULED

    return file_stream(
        spark, f"{warehouse}/data/scheduled/*", SCHEDULED, max_files_per_trigger
    )


def crawl_cycle_rates(stream: DataFrame) -> DataFrame:
    """Live crawl dashboard: per-(cycle, host) attempt/outcome counts.
    cycle_id is monotone over the feed, so `complete`/`update` output
    needs state only for the trailing cycles."""
    return stream.groupBy("cycle_id", "host").agg(
        F.count("*").alias("n_attempts"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("long").alias("n_ok"),
        F.max("batch_pos").cast("long").alias("max_batch_pos"),
    )


# -- S6: exactly-once sink -------------------------------------------------

def manifest_sink(stream: DataFrame, catalog, table: str, checkpoint: str):
    """S6: land micro-batches in the snapshot catalog atomically.
    Idempotence: the manifest records (table, epoch); a replayed epoch
    (restart between write and checkpoint commit) is skipped, giving
    exactly-once table contents on top of the source's replay."""

    def write_batch(df: DataFrame, epoch: int) -> None:
        cur = catalog.current_snapshot() or {}
        if cur.get("meta", {}).get(f"stream_epoch_{table}") == epoch:
            return
        txn = catalog.begin()
        txn.append(table, df)
        meta = dict(cur.get("meta", {}))
        meta[f"stream_epoch_{table}"] = epoch
        txn.commit(cycle_id=cur.get("cycle_id", 0), meta=meta)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )
