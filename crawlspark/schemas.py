"""Fixed StructType schemas for every engine table (SURVEY.md §1.2).

The reference keeps these shapes implicit in dict payloads pushed
through beanstalkd tubes; here every table has a pinned columnar
schema so Parquet pushdown / pruning and the snapshot catalog can rely
on them.
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

# input_hint shape: (doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)
DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("fetch_cycle", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# Append-only discovery log: a URL enters the frontier exactly once.
FRONTIER = T.StructType(
    [
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_salt", T.IntegerType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("site_priority", T.IntegerType(), False),
        T.StructField("score", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("discovered_from", T.StringType(), True),
        T.StructField("cycle_id", T.LongType(), False),
    ]
)

# Append-only schedule log (one row per fetch ATTEMPT; `ok` records
# the outcome). History only — the cycle hot path never scans it;
# QUEUED is frontier ANTI `resolved` (below).
SCHEDULED = T.StructType(
    [
        T.StructField("cycle_id", T.LongType(), False),
        T.StructField("batch_pos", T.LongType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("host_salt", T.IntegerType(), False),
        T.StructField("score", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("attempt", T.IntegerType(), False),
        T.StructField("ok", T.BooleanType(), False),
    ]
)

# Tombstones: URLs whose frontier life is over (fetched OK or retries
# exhausted). ≤ batch-size rows appended per cycle; periodically folded
# into `frontier` (frontier ANTI resolved → overwrite, resolved →
# empty) so the per-cycle read stays ∝ active frontier, never ∝ total
# crawl history — the manifest-catalog analogue of Iceberg MERGE
# INTO / equality-delete files with background compaction.
RESOLVED = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("cycle_id", T.LongType(), False),
    ]
)

# URLs with ≥1 failed attempt that are still retryable. Small (the
# in-flight retry pool); overwritten each cycle from ≤ batch-size
# outcome rows. attempt = n_fail + 1 on the next schedule.
RETRY_STATE = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("n_fail", T.IntegerType(), False),
    ]
)

# Append-only discovery lineage (parent doc → discovered URL). Keeps
# the link graph durable independently of frontier folding.
EDGES = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("cycle_id", T.LongType(), False),
    ]
)

# C35 (content-seen test): sig = md5-60 of the canonical span JSON of
# each content-NOVEL stored document → the first URL that published it
# and the cycle it landed. Mirrors (later fetches with a stored sig)
# are suppressed: not stored, links not extracted.
CONTENT_SEEN = T.StructType(
    [
        T.StructField("sig", T.LongType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("cycle_id", T.LongType(), False),
    ]
)

URL_SEEN = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("first_cycle", T.LongType(), False),
        T.StructField("part", T.IntegerType(), False),
    ]
)

BLOOM_SEEN = T.StructType(
    [
        T.StructField("part", T.IntegerType(), False),
        T.StructField("cycle_id", T.LongType(), False),
        T.StructField("nbits", T.LongType(), False),
        T.StructField("k", T.IntegerType(), False),
        T.StructField("bits", T.BinaryType(), False),
    ]
)

CUCKOO_SEEN = T.StructType(
    [
        T.StructField("part", T.IntegerType(), False),
        T.StructField("cycle_id", T.LongType(), False),
        T.StructField("nbuckets", T.LongType(), False),
        T.StructField("bucket_size", T.IntegerType(), False),
        # kick budget exhausted while inserting: the probe answers
        # all-maybe for this part (exact anti-join takes over) so the
        # no-false-negative contract survives a full filter
        T.StructField("overflow", T.BooleanType(), False),
        # little-endian uint16 fingerprints, nbuckets*bucket_size slots
        T.StructField("bits", T.BinaryType(), False),
    ]
)

# One robots rule. Plain rules match by path prefix; rules whose
# robots.txt path contained '*' or '$' carry a compiled regex in
# `pattern` (anchored at path start). `spec` = length of the original
# rule path — Google-spec precedence: most specific rule wins, Allow
# wins ties (crawlspark/robots.py builds these from real robots.txt).
ROBOTS_RULE = T.StructType(
    [
        T.StructField("allow", T.BooleanType(), False),
        T.StructField("prefix", T.StringType(), False),
        T.StructField("pattern", T.StringType(), True),
        T.StructField("spec", T.IntegerType(), False),
    ]
)

# Static per-host config (robots, budgets, priority) — written once.
HOST_CONFIG = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("robots_rules", T.ArrayType(ROBOTS_RULE), False),
        T.StructField("crawl_delay_ms", T.LongType(), False),
        T.StructField("token_capacity", T.DoubleType(), False),
        T.StructField("refill_per_cycle", T.DoubleType(), False),
        T.StructField("site_priority", T.IntegerType(), False),
    ]
)

# Dynamic per-host politeness state — append-only deltas, latest
# last_cycle per host wins at read. Only hosts that SPEND tokens in a
# cycle get a delta row (token refill is computed lazily from the
# elapsed-cycle count, which is exact because iterated
# least(cap, t + r) equals one-shot least(cap, t + k·r) for r ≥ 0) —
# so per-cycle writes are ∝ hosts-in-batch, not ∝ all 10^8 hosts.
HOST_STATE = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("tokens", T.DoubleType(), False),
        T.StructField("last_cycle", T.LongType(), False),
    ]
)

# Derived view, not a stored table: engine.fetch_log() computes these
# rows on read from scheduled ⋈ documents (every column is a function
# of those two logs), so cycles don't pay a staged write for it. The
# schema stays pinned here for the view's output contract and for
# foreign writers (e.g. the streaming manifest-sink tests).
FETCH_LOG = T.StructType(
    [
        T.StructField("cycle_id", T.LongType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("fetched_at", T.TimestampType(), False),
        T.StructField("bytes", T.LongType(), False),
    ]
)

# Per-cycle, per-partition lineage + counters. part = host_salt for
# distribution metrics; part = -1 carries cycle-level wall-clock.
# C23 trap guard: lifetime frontier admissions per URL pattern.
# Append-only deltas, summed on read (merge-on-read; compacted with
# the other working state at snapshot expiry).
PATTERN_COUNTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)

# C38 per-host lifetime admission counts (append-only deltas, summed
# on read — the pattern_counts discipline scoped to the host)
HOST_ADMISSIONS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)

# C39 clock-eviction log + tombstones (url stays in url_seen; the
# frontier read anti-joins this table): lap 1 took an unreferenced
# entry, lap 2 a just-cleared one. Tombstones are keyed by the
# INCARNATION (url + admission seq), not the url alone: C20/C21/C25
# forget/reseed/revisit re-inject forgotten URLs with strictly-new
# seqs, and that fresh incarnation must queue — only the evicted
# frontier row stays dead (seqs are never reused, so an old tombstone
# can never shadow new work).
EVICTIONS = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("lap", T.IntegerType(), False),
        T.StructField("cycle_id", T.LongType(), False),
    ]
)

# C39 reference bits: pending URLs re-discovered since the last sweep
# (append-only deltas between sweeps; overwritten to the surviving set
# at each sweep)
REF_BITS = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("cycle_id", T.LongType(), False),
    ]
)

# C39 clock hand: the admission seq the next sweep resumes at (single
# row, overwritten per sweep)
CLOCK_STATE = T.StructType(
    [
        T.StructField("hand", T.LongType(), False),
        T.StructField("cycle_id", T.LongType(), False),
    ]
)

# C24 redirect map: every successful 301 hop (alias → canonical
# Location), append-only — the URL-aliasing identity a re-crawl or
# link-graph consumer needs even when the target was already seen.
REDIRECTS = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("cycle_id", T.LongType(), False),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("cycle_id", T.LongType(), False),
        T.StructField("part", T.IntegerType(), False),
        T.StructField("urls_in", T.LongType(), False),
        T.StructField("urls_deduped", T.LongType(), False),
        T.StructField("urls_scheduled", T.LongType(), False),
        T.StructField("docs_written", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

TABLE_SCHEMAS = {
    "documents": DOCUMENTS,
    "frontier": FRONTIER,
    "scheduled": SCHEDULED,
    "resolved": RESOLVED,
    "retry_state": RETRY_STATE,
    "edges": EDGES,
    "url_seen": URL_SEEN,
    "content_seen": CONTENT_SEEN,
    "bloom_seen": BLOOM_SEEN,
    "cuckoo_seen": CUCKOO_SEEN,
    "host_config": HOST_CONFIG,
    "host_state": HOST_STATE,
    "fetch_log": FETCH_LOG,
    "pattern_counts": PATTERN_COUNTS,
    "host_admissions": HOST_ADMISSIONS,
    "evictions": EVICTIONS,
    "ref_bits": REF_BITS,
    "clock_state": CLOCK_STATE,
    "redirects": REDIRECTS,
    # C37 rel=canonical alias map — same (src, dst, cycle_id) shape
    "canonicals": REDIRECTS,
    "metrics": METRICS,
}
