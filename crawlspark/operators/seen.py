"""URL-seen set: partitioned exact table + per-partition Bloom sidecar
(operators C4 seen_filter / C5 bloom_build, SURVEY.md §2.1).

The reference uses an exact KV membership set (Redis SADD/SISMEMBER,
one round-trip per URL). At 10^10-URL scale the batch equivalent is:

1. **Bloom prefilter** (cheap, partition-parallel): candidates are
   cogrouped with their partition's Bloom bitset; a miss proves the
   URL was never inserted (no false negatives by construction), so
   only Bloom *hits* proceed to the expensive exact check.
2. **Exact anti-join** against `url_seen` on (url_hash, url_norm) —
   the url_norm equality guards against 64-bit hash collisions, which
   the reference's exact set would never admit.

Bitsets are one row per `part = pmod(url_hash, P)` in `bloom_seen`,
folded incrementally each cycle via a cogrouped applyInPandas (no
driver-side collect of hashes). All bit math is vectorized numpy over
Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import BLOOM_SEEN

NBITS_DEFAULT = 1 << 20  # 128 KiB per partition
K_DEFAULT = 6
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _bit_positions(hashes: np.ndarray, nbits: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Double hashing: pos_i = (h1 + i*h2) mod nbits. Returns (byte_idx, mask)
    with shape (k, n)."""
    h1 = hashes.view(np.uint64)
    h2 = (h1 * _GOLDEN) | np.uint64(1)
    idx = np.arange(k, dtype=np.uint64)[:, None]
    pos = (h1[None, :] + idx * h2[None, :]) % np.uint64(nbits)
    return (pos >> np.uint64(3)).astype(np.int64), (
        np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
    )


def _insert(bits: np.ndarray, hashes: np.ndarray, nbits: int, k: int) -> None:
    byte_idx, mask = _bit_positions(hashes, nbits, k)
    np.bitwise_or.at(bits, byte_idx.ravel(), mask.ravel())


def _contains(bits: np.ndarray, hashes: np.ndarray, nbits: int, k: int) -> np.ndarray:
    byte_idx, mask = _bit_positions(hashes, nbits, k)
    hit = (bits[byte_idx] & mask) == mask
    return hit.all(axis=0)


def fold_bloom_native(
    new_hashes: DataFrame, bloom: DataFrame, cycle_id: int,
    nbits: int, k: int,
) -> DataFrame | None:
    """C5 fold with zero Python stages (native/src/BloomFold.scala):
    a JVM UDAF folds each part's new hashes into a bitset WITH partial
    aggregation — map tasks emit pre-ORed bitsets, so the shuffle
    carries ≤ tasks×parts fixed-size buffers instead of every novel
    hash (the 10^9-discoveries-per-cycle design point; the Python
    cogroup shuffles all hashes and pays an Arrow round-trip). The new
    bits are OR-merged with the previous cycle's row by a JVM scalar
    UDF. Bit-identical to the numpy fold (property-tested). Returns
    None when the native jar isn't on this session's classpath."""
    spark = new_hashes.sparkSession
    if not _native_loaded(spark):
        return None
    spark._jvm.crawlspark.nativejvm.BloomFold.register(
        spark._jsparkSession, "crawlspark_bloom_fold", nbits, k
    )
    new_bits = new_hashes.groupBy("part").agg(
        F.expr("crawlspark_bloom_fold(url_hash)").alias("new_bits")
    )
    touched = new_hashes.select("part").distinct()
    folded = (
        new_bits.join(
            bloom.join(touched, "part", "left_semi").select("part", "bits"),
            "part", "left",
        )
        .select(
            "part",
            F.lit(cycle_id).cast("long").alias("cycle_id"),
            F.lit(nbits).cast("long").alias("nbits"),
            F.lit(k).cast("int").alias("k"),
            F.expr("crawlspark_bloom_fold_or(bits, new_bits)").alias("bits"),
        )
    )
    untouched = bloom.join(touched, "part", "left_anti")
    out = folded.unionByName(untouched)
    # Unlike the Python cogroup (whose applyInPandas output carries
    # fresh attributes), this plan keeps `new_hashes`' lineage — so a
    # caller composing the fold output with an overlapping source
    # (e.g. probing the same candidates) would hit Spark's
    # ambiguous-self-join check. Re-aliasing every column mints fresh
    # attribute ids, restoring the cogroup path's composability.
    return out.select(*[F.col(c).alias(c) for c in out.columns])


def fold_bloom(
    new_hashes: DataFrame,  # columns: part int, url_hash long
    bloom: DataFrame,  # current bloom_seen table
    cycle_id: int,
    nbits: int = NBITS_DEFAULT,
    k: int = K_DEFAULT,
) -> DataFrame:
    """OR this cycle's new url_hashes into each partition's bitset.
    Partitions with no new hashes keep their old row (unioned below).
    Dispatches to the JVM-native fold when the jar is loaded (same
    bits, no Python stage, partial-agg shuffle); this cogrouped
    numpy path is the universal fallback."""
    native = fold_bloom_native(new_hashes, bloom, cycle_id, nbits, k)
    if native is not None:
        return native

    def fold(key: tuple, new_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(bloom_pdf):
            bits = np.frombuffer(bloom_pdf["bits"].iloc[0], dtype=np.uint8).copy()
        else:
            bits = np.zeros(nbits // 8, dtype=np.uint8)
        if len(new_pdf):
            _insert(bits, new_pdf["url_hash"].to_numpy(np.int64), nbits, k)
        return pd.DataFrame(
            {
                "part": [key[0]],
                "cycle_id": [cycle_id],
                "nbits": [nbits],
                "k": [k],
                "bits": [bits.tobytes()],
            }
        )

    touched = new_hashes.select("part").distinct()
    folded = (
        new_hashes.groupBy("part")
        .cogroup(bloom.join(touched, "part", "left_semi").groupBy("part"))
        .applyInPandas(fold, schema=BLOOM_SEEN)
    )
    untouched = bloom.join(touched, "part", "left_anti")
    return folded.unionByName(untouched)


def bloom_prefilter_broadcast(candidates: DataFrame, bloom: DataFrame) -> DataFrame:
    """Adds `maybe_seen` via a *broadcast* Bloom probe: the bitsets are
    collected (P × nbits/8 bytes) and shipped to executors once, then a
    narrow vectorized pandas UDF probes them — no cogroup shuffle.

    Scale envelope: right choice while the whole sidecar fits in
    executor memory (≤ ~256 MB ⇒ up to ~10^8–10^9 seen URLs at 10
    bits/key). Beyond that, use :func:`bloom_prefilter` (cogroup,
    partition-local bitsets — nothing is ever collected)."""
    spark = candidates.sparkSession
    tables = {
        int(r["part"]): (
            np.frombuffer(r["bits"], dtype=np.uint8),
            int(r["nbits"]),
            int(r["k"]),
        )
        for r in bloom.collect()
    }
    bc = spark.sparkContext.broadcast(tables)
    _BROADCASTS.append(bc)

    @F.pandas_udf(T.BooleanType())
    def probe(part: pd.Series, url_hash: pd.Series) -> pd.Series:
        t = bc.value
        pv = part.to_numpy()
        hv = url_hash.to_numpy(np.int64)
        out = np.zeros(len(pv), dtype=bool)
        for p in np.unique(pv):
            e = t.get(int(p))
            if e is not None:
                m = pv == p
                out[m] = _contains(e[0], hv[m], e[1], e[2])
        return pd.Series(out)

    return candidates.withColumn("maybe_seen", probe("part", "url_hash"))


BROADCAST_BLOOM_MAX_BYTES = 256 << 20

# Live bitset broadcasts from bloom_prefilter_broadcast. A long crawl
# creates one per cycle; without release they accumulate P×nbits/8
# bytes per cycle on the driver and every executor. The engine calls
# release_broadcasts() after each cycle's outputs are materialized
# (alongside schedule.release_scratch()).
_BROADCASTS: list = []


def release_broadcasts(spark=None) -> None:
    for bc in _BROADCASTS:
        try:
            bc.destroy()
        except Exception:
            pass
    _BROADCASTS.clear()
    if spark is not None and _native_loaded(spark):
        spark._jvm.crawlspark.nativejvm.BloomProbe.release()
        try:
            spark._jvm.crawlspark.nativejvm.CuckooFilter.release()
        except Exception:
            pass  # jar predates the cuckoo class


def _native_loaded(spark) -> bool:
    import os

    if os.environ.get("CRAWLSPARK_NO_NATIVE"):
        return False
    try:
        spark._jvm.java.lang.Class.forName("crawlspark.nativejvm.BloomProbe")
        return True
    except Exception:
        return False


def bloom_prefilter_native(candidates: DataFrame, bloom: DataFrame) -> DataFrame | None:
    """Adds `maybe_seen` via the JVM-native probe (native/src/
    BloomProbe.scala): bitsets collected + broadcast once, then probed
    by a registered JVM UDF — the per-URL hot path never crosses into
    Python/Arrow. Bit-identical to the numpy probe (property-tested).
    Returns None when the native jar isn't on this session's classpath
    (e.g. the driver's own session) — callers fall back to the Python
    broadcast probe. Re-registration each cycle destroys the previous
    cycle's bitset broadcast JVM-side."""
    spark = candidates.sparkSession
    if not _native_loaded(spark):
        return None
    spark._jvm.crawlspark.nativejvm.BloomProbe.register(
        spark._jsparkSession, bloom._jdf, "crawlspark_bloom_probe"
    )
    return candidates.withColumn(
        "maybe_seen", F.expr("crawlspark_bloom_probe(part, url_hash)")
    )


def bloom_prefilter(candidates: DataFrame, bloom: DataFrame) -> DataFrame:
    """Adds boolean `maybe_seen`: False ⇒ provably never inserted
    (skips the exact anti-join); True ⇒ must be checked exactly.
    `candidates` must carry `part` and `url_hash`."""
    cand_cols = candidates.schema.fieldNames()
    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )

    def probe(key: tuple, cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand_pdf) == 0:
            return pd.DataFrame(columns=[*cand_cols, "maybe_seen"])
        if len(bloom_pdf) == 0:
            maybe = np.zeros(len(cand_pdf), dtype=bool)
        else:
            bits = np.frombuffer(bloom_pdf["bits"].iloc[0], dtype=np.uint8)
            nbits = int(bloom_pdf["nbits"].iloc[0])
            k = int(bloom_pdf["k"].iloc[0])
            maybe = _contains(bits, cand_pdf["url_hash"].to_numpy(np.int64), nbits, k)
        return cand_pdf.assign(maybe_seen=maybe)

    return (
        candidates.groupBy("part")
        .cogroup(bloom.groupBy("part"))
        .applyInPandas(probe, schema=out_schema)
    )


def seen_filter(
    candidates: DataFrame, url_seen: DataFrame, bloom: DataFrame,
    broadcast_bloom: bool | None = None,
    seen_mirror: str | None = None,
) -> DataFrame:
    """C4: return only never-seen candidates. Exactness: the Bloom can
    only send extra rows *to* the anti-join, never around it.

    Probe strategy (auto): broadcast the bitsets while the sidecar is
    small (narrow probe, no shuffle); fall back to the cogrouped
    partition-local probe at sidecar sizes that must stay distributed.
    Callers should persist `candidates` — the definitely-new/maybe
    branches both consume the probe stage."""
    if broadcast_bloom is None:
        first = bloom.select("nbits").limit(1).collect()
        if first:
            nbits = int(first[0][0])
            n_parts = bloom.count()
            broadcast_bloom = n_parts * (nbits // 8) <= BROADCAST_BLOOM_MAX_BYTES
        else:
            broadcast_bloom = True
    if broadcast_bloom:
        probed = bloom_prefilter_native(candidates, bloom)
        if probed is None:
            probed = bloom_prefilter_broadcast(candidates, bloom)
    else:
        probed = bloom_prefilter(candidates, bloom)
    definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    if seen_mirror is not None:
        # bucketed mirror: only the (small) maybe side shuffles into
        # the bucket layout; the seen table is scan-local. url_norm
        # rides along as a join condition (collision guard) — bucket
        # clustering on url_hash still satisfies the distribution.
        from . import bucketing

        checked = bucketing.colocated_anti_join(
            maybe, candidates.sparkSession, seen_mirror,
            ["url_hash", "url_norm"],
        )
    else:
        checked = maybe.join(
            url_seen.select("url_hash", "url_norm"),
            ["url_hash", "url_norm"], "left_anti",
        )
    return definitely_new.unionByName(checked)
