"""Fetch + parse operators (C12 fetch_exec, C13 link_extract,
C14 span_assemble).

C12 replaces the reference's Thrift-dispatched HTTP worker pool with a
hermetic deterministic page generator running in `mapInPandas` — same
interface a real async-HTTP fetcher would use (Arrow batch of URLs in,
Arrow batch of span-documents out), so swapping in a network fetcher
touches only `make_fetcher`.

C13 is pure JVM: posexplode(spans) → regexp_extract_all(href) →
posexplode — link order is (span_pos, link_pos), matching a serial
parser walking the document top-to-bottom.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import SPAN
from ..synth import GraphConfig

# href="X" or <loc>X</loc> (C26 sitemaps) — single capture group, one
# regexp_extract_all pass; must stay identical to synth._HREF
HREF_PATTERN = r'(?:href="|<loc>)([^"<]+)'


def fetch_batch(batch: DataFrame, cfg: GraphConfig, cycle_id: int) -> DataFrame:
    """C12: batch(url_norm, host, depth, batch_pos, attempt) → one row
    per fetch ATTEMPT: ok + interleaved text+media spans on success
    (input_hint shape), empty spans on a failed attempt (the
    deterministic failure model in GraphConfig.fetch_ok — the
    at-least-once/TTR analogue)."""
    in_schema = batch.select("url_norm", "host", "depth", "batch_pos", "attempt").schema
    out_schema = T.StructType(
        list(in_schema)
        + [
            T.StructField("ok", T.BooleanType(), False),
            T.StructField("spans", T.ArrayType(SPAN), False),
            # C24: 301 Location for alias URLs (null = a real document).
            # A redirect response is a SUCCESSFUL terminal fetch of the
            # alias — no spans, no document; the target re-enters the
            # discovery path. Failed alias attempts retry like any.
            T.StructField("redirect_to", T.StringType(), True),
        ]
    )

    def fetcher(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            oks, spans, redirs = [], [], []
            for u, attempt in zip(pdf["url_norm"], pdf["attempt"]):
                i, j = cfg.url_to_page(u)
                ok = cfg.fetch_ok(i, j, int(attempt))
                tgt = cfg.alias_target(i, j) if ok else None
                oks.append(ok)
                redirs.append(tgt)
                spans.append(
                    cfg.page_spans(
                        i, j, cfg.page_rev(i, j, cycle_id), cycle=cycle_id
                    )
                    if ok and tgt is None
                    else []
                )
            yield pdf.assign(ok=oks, spans=spans, redirect_to=redirs)

    docs = batch.select("url_norm", "host", "depth", "batch_pos", "attempt").mapInPandas(
        fetcher, schema=out_schema
    )
    return docs.withColumn("fetch_cycle", F.lit(cycle_id).cast("long")).withColumn(
        "doc_id", F.col("url_norm")
    )


def extract_links(docs: DataFrame) -> DataFrame:
    """C13: document spans → (batch_pos, span_pos, link_pos, raw_url,
    parent depth). Whole-stage-codegen'd — no Python."""
    spans = docs.select(
        "doc_id",
        "depth",
        "batch_pos",
        F.posexplode("spans").alias("span_pos", "span"),
    ).filter(F.col("span.kind") == "text")
    return (
        spans.select(
            "doc_id",
            "depth",
            "batch_pos",
            "span_pos",
            F.posexplode(
                F.regexp_extract_all(F.col("span.text"), F.lit(HREF_PATTERN), F.lit(1))
            ).alias("link_pos", "raw_url"),
        )
    )


def doc_bytes_col():
    """Deterministic 'response size': text lengths + 64 per media span
    (JVM higher-order aggregate; used by fetch_log)."""
    return F.aggregate(
        "spans",
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.length(F.coalesce(s["text"], F.lit("")))
        + F.when(s["kind"] == "media", F.lit(64)).otherwise(F.lit(0)),
    )
