"""crawlspark — a from-scratch PySpark-native crawl frontier + fetch scheduler.

Re-expresses the capabilities of the reference crawler
(youfeng243/crawler — beanstalkd priority-FIFO work queues + Thrift
fetch workers; see SURVEY.md §0 for the provenance protocol: the
reference mount was empty, so semantics are pinned by
BASELINE.json:north_rule / north_star) as Iceberg-shaped batch
micro-cycles on Spark DataFrames:

- URL canonicalization (RFC-3986) via vectorized Arrow UDFs
- xxhash64 URL-seen set: partitioned table + per-partition Bloom sidecar
- per-host politeness: robots longest-prefix rules + crawl-delay token buckets
- priority scheduling: score = depth + site_priority, FIFO (seq) tie-break
- host-salted skew handling, two-phase per-host fan-out caps
- interleaved text+media span documents (input_hint shape)
- snapshot-manifest catalog for atomic per-cycle commits + exact resume
"""

__version__ = "0.1.0"
