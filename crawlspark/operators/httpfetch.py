"""C12 real-network flavor: a live HTTP fetcher with the SAME Arrow
batch contract as `operators/fetch.fetch_batch` — (url_norm, host,
depth, batch_pos, attempt) in, (… ok, spans, redirect_to) out — so the
engine's synthetic generator swaps for the network by changing only
which fetcher a cycle calls (fetch.py's documented swap surface).

The sandbox has no DNS, so the engine keeps the hermetic generator as
its default; THIS module is the production implementation, exercised
in tests against a loopback `http.server` (tests/test_httpfetch.py):
redirects surfaced un-followed, 4xx/5xx/timeouts as failed attempts
(the engine's TTR retry path), per-host connection caps, Content-Type
charset decoding.

Scale shape: network I/O is the one legitimately per-row Python stage
(it blocks on sockets, not CPU); each Arrow batch fans out over a
bounded thread pool with a per-host semaphore, so a partition holds at
most `pool_size` sockets and at most `max_per_host` to any one host —
the in-task backstop under the engine's token-bucket scheduling, which
already guarantees a host appears ≤ cap times per batch. Executors
never share fetch state: politeness budgeting stays in the plan, not
in the worker.
"""

from __future__ import annotations

import threading
import urllib.error
import urllib.request
from collections.abc import Iterator
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import SPAN

DEFAULT_AGENT = "crawlspark"

OUT_FIELDS = [
    T.StructField("ok", T.BooleanType(), False),
    T.StructField("spans", T.ArrayType(SPAN), False),
    T.StructField("redirect_to", T.StringType(), True),
]


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    """Return 3xx responses to the caller instead of following them —
    the engine owns redirect admission (C24), not the socket layer."""

    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None


def _charset(resp) -> str:
    ct = resp.headers.get("Content-Type", "")
    for part in ct.split(";")[1:]:
        k, _, v = part.strip().partition("=")
        if k.lower() == "charset" and v:
            return v
    return "utf-8"


def fetch_one(
    url: str,
    timeout_s: float,
    agent: str = DEFAULT_AGENT,
    max_bytes: int = 4 << 20,
) -> tuple[bool, list, str | None]:
    """One blocking fetch → (ok, spans, redirect_to). 3xx is a
    SUCCESSFUL terminal fetch of the alias (no spans); 4xx/5xx/socket
    errors/timeouts are failed attempts the engine re-queues."""
    opener = urllib.request.build_opener(_NoRedirect())
    req = urllib.request.Request(url, headers={"User-Agent": agent})
    try:
        with opener.open(req, timeout=timeout_s) as resp:
            body = resp.read(max_bytes)
            text = body.decode(_charset(resp), errors="replace")
            return True, [{"kind": "text", "text": text,
                           "media_ref": None, "offset": 0}], None
    except urllib.error.HTTPError as e:
        if 300 <= e.code < 400 and e.headers.get("Location"):
            return True, [], e.headers["Location"]
        return False, [], None
    except Exception:
        return False, [], None


def http_fetch_batch(
    batch: DataFrame,
    cycle_id: int,
    timeout_s: float = 10.0,
    pool_size: int = 16,
    max_per_host: int = 4,
    agent: str = DEFAULT_AGENT,
) -> DataFrame:
    """Drop-in network counterpart of `fetch.fetch_batch` (same output
    schema, including fetch_cycle/doc_id)."""
    in_schema = batch.select(
        "url_norm", "host", "depth", "batch_pos", "attempt"
    ).schema
    out_schema = T.StructType(list(in_schema) + OUT_FIELDS)

    def fetcher(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sems: dict[str, threading.Semaphore] = {}
        lock = threading.Lock()

        def guarded(url: str, host: str):
            with lock:
                sem = sems.setdefault(host, threading.Semaphore(max_per_host))
            with sem:
                return fetch_one(url, timeout_s, agent)

        for pdf in it:
            with ThreadPoolExecutor(max_workers=pool_size) as pool:
                res = list(pool.map(guarded, pdf["url_norm"], pdf["host"]))
            yield pdf.assign(
                ok=[r[0] for r in res],
                spans=[r[1] for r in res],
                redirect_to=[r[2] for r in res],
            )

    docs = batch.select(
        "url_norm", "host", "depth", "batch_pos", "attempt"
    ).mapInPandas(fetcher, schema=out_schema)
    return docs.withColumn(
        "fetch_cycle", F.lit(cycle_id).cast("long")
    ).withColumn("doc_id", F.col("url_norm"))


def fetch_robots(
    hosts: DataFrame, scheme: str = "http", timeout_s: float = 10.0,
    agent: str = DEFAULT_AGENT,
) -> DataFrame:
    """Live /robots.txt ingestion for a `host` column (the network
    counterpart of synth's robots_txt): (host, robots_txt) with null
    for unreachable/absent files — C6's parser (`robots.compile_robots`)
    consumes the result unchanged. One fetch per host (the cold path),
    batched through the same Arrow interface."""
    out_schema = T.StructType(
        [
            T.StructField("host", T.StringType(), False),
            T.StructField("robots_txt", T.StringType(), True),
        ]
    )

    def fetcher(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = []
            for h in pdf["host"]:
                ok, spans, _ = fetch_one(
                    f"{scheme}://{h}/robots.txt", timeout_s, agent
                )
                texts.append(spans[0]["text"] if ok and spans else None)
            yield pd.DataFrame({"host": pdf["host"], "robots_txt": texts})

    return hosts.select("host").mapInPandas(fetcher, schema=out_schema)
