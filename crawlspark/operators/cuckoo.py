"""Cuckoo-filter URL-seen sidecar (the `cuckoo` half of the north
rule's "bloom/cuckoo URL-seen"; alternative to operators/seen.py's
Bloom sidecar, same C4/C5 contract).

Why a second sidecar: a Bloom bitset is insert-only, so *forgetting* a
URL (re-crawl scheduling, takedown, TTL expiry) forces a rebuild of
the partition's bitset from the exact table. A cuckoo filter stores
16-bit fingerprints in 4-slot buckets and supports O(1) deletion, so
`CrawlEngine.forget()` can drop keys from the sidecar in place at the
same cost as an insert. Space is comparable (2 B/key at ≤95% load vs
~1.25 B/key for the Bloom at k=6) with strictly better false-positive
rates at equal bits.

Layout per `part` row (one row per `pmod(url_hash, P)` partition,
mirroring `bloom_seen`): `bits` = little-endian uint16 array of
`nbuckets × bucket_size` fingerprint slots, 0 = empty. Derivation from
the 64-bit url_hash (all constants fixed so layouts replay):

    fp = (h >> 48) & 0xFFFF, 0 mapped to 1       (16-bit, nonzero)
    i1 = h & (nbuckets - 1)                       (nbuckets power of 2)
    i2 = i1 XOR ((fp * 0x5bd1e995) & (nbuckets-1))   (self-inverse)

Invariants the engine's exactness proof needs:
- **No false negatives**: every inserted key's fingerprint sits in
  bucket i1 or i2 (or the row's `overflow` flag is set, which makes
  the probe answer "maybe" for the whole part — the exact anti-join
  then does all the work; correctness never depends on the filter).
- **Duplicates are retained** (insert never dedups): two distinct keys
  that collide on (bucket, fp) hold two slot copies, so deleting one
  key can never erase the other's evidence — the standard condition
  under which cuckoo deletion is sound. The engine folds each url_hash
  at most once (only `novel` rows reach the fold), so copies map 1:1
  to inserted keys.
- **Deterministic layout**: inserts are applied in sorted url_hash
  order with a fixed eviction rule (victim slot = kick# mod
  bucket_size), so the same key set folded the same way yields
  byte-identical rows on any cluster size or partitioning.

The per-part fold is a sequential Python loop over an
``array('H')`` (cuckoo insertion is inherently sequential — each
eviction depends on the previous one), cogrouped per part exactly like
the Bloom numpy fallback; probes are fully vectorized numpy over the
broadcast tables. At the 10^9-discoveries design point the fold would
move to a JVM UDAF like native/src/BloomFold.scala — but unlike the
Bloom OR, cuckoo tables do not merge associatively, so the UDAF would
be a sorted single-reduce per part, not a partial aggregation; the
cogroup here has the same shuffle shape.
"""

from __future__ import annotations

from array import array

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import CUCKOO_SEEN

NBUCKETS_DEFAULT = 1 << 15  # x4 slots x2 B = 256 KiB/part, ~124k keys at 95%
BUCKET_SIZE = 4
MAX_KICKS = 500
_FPMIX = 0x5BD1E995


def _slots(hashes: np.ndarray, nbuckets: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized (fp, i1, i2) for int64 url_hashes.

    i1 comes from bits 16+ — NOT the low bits — because the engine
    partitions the seen table by pmod(url_hash, n_seen_parts): with a
    power-of-two part count the low bits are CONSTANT within a part,
    and a low-bit i1 could then only reach 1/n_parts of the buckets
    (measured: a 76%-nominal-fill fold overflowed under 64 parts).
    Bits 16..16+log2(nbuckets) are disjoint from the part selector for
    any n_seen_parts ≤ 65536 and from the fingerprint (bits 48..63).
    The JVM twin (native/src/CuckooFilter.scala) mirrors this exactly."""
    h = hashes.view(np.uint64)
    fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.int64)
    fp[fp == 0] = 1
    mask = np.uint64(nbuckets - 1)
    i1 = ((h >> np.uint64(16)) & mask).astype(np.int64)
    i2 = i1 ^ ((fp * _FPMIX) & int(mask))
    return fp, i1, i2


def _insert_all(
    tbl: array, fps: np.ndarray, i1s: np.ndarray, nbuckets: int,
    bucket_size: int, max_kicks: int,
) -> bool:
    """Sequential insert of (fp, i1) pairs into the flat slot array.
    Returns True if any insert overflowed (kick budget exhausted)."""
    bmask = nbuckets - 1
    overflow = False
    for fp, b1 in zip(fps.tolist(), i1s.tolist()):
        b2 = b1 ^ ((fp * _FPMIX) & bmask)
        placed = False
        for b in (b1, b2):
            base = b * bucket_size
            for s in range(bucket_size):
                if tbl[base + s] == 0:
                    tbl[base + s] = fp
                    placed = True
                    break
            if placed:
                break
        if placed:
            continue
        # evict: deterministic victim slot = kick# mod bucket_size
        b, cur = b1, fp
        for kick in range(max_kicks):
            s = kick % bucket_size
            base = b * bucket_size
            cur, tbl[base + s] = tbl[base + s], cur
            b = b ^ ((cur * _FPMIX) & bmask)
            base = b * bucket_size
            for s2 in range(bucket_size):
                if tbl[base + s2] == 0:
                    tbl[base + s2] = cur
                    placed = True
                    break
            if placed:
                break
        if not placed:
            # put the homeless fingerprint back in its victim chain's
            # last bucket? No — mark the part degraded instead: the
            # probe answers all-maybe and the exact check takes over.
            overflow = True
    return overflow


def _delete_all(
    tbl: array, fps: np.ndarray, i1s: np.ndarray, nbuckets: int, bucket_size: int
) -> None:
    """Remove ONE slot copy per requested key (i1 slots first, then
    i2). Only sound for keys that were actually inserted — the engine
    semi-joins forget targets against the exact table first."""
    bmask = nbuckets - 1
    for fp, b1 in zip(fps.tolist(), i1s.tolist()):
        b2 = b1 ^ ((fp * _FPMIX) & bmask)
        for b in (b1, b2):
            base = b * bucket_size
            hit = False
            for s in range(bucket_size):
                if tbl[base + s] == fp:
                    tbl[base + s] = 0
                    hit = True
                    break
            if hit:
                break


def _contains(
    bits: np.ndarray, hashes: np.ndarray, nbuckets: int, bucket_size: int,
    overflow: bool,
) -> np.ndarray:
    """Vectorized membership: fp present in bucket i1 or i2."""
    if overflow:
        return np.ones(len(hashes), dtype=bool)
    fp, i1, i2 = _slots(hashes, nbuckets)
    t = bits.reshape(nbuckets, bucket_size)
    f = fp[:, None].astype(np.uint16)
    return (t[i1] == f).any(axis=1) | (t[i2] == f).any(axis=1)


def _apply(
    bloom_pdf: pd.DataFrame, key: tuple, hashes: np.ndarray, cycle_id: int,
    nbuckets: int, bucket_size: int, max_kicks: int, op: str,
) -> pd.DataFrame:
    """Shared cogroup body for fold/delete: load-or-init the part's
    table, apply sorted ops, re-emit the row."""
    if len(bloom_pdf):
        tbl = array("H")
        tbl.frombytes(bloom_pdf["bits"].iloc[0])
        nbuckets = int(bloom_pdf["nbuckets"].iloc[0])
        bucket_size = int(bloom_pdf["bucket_size"].iloc[0])
        overflow = bool(bloom_pdf["overflow"].iloc[0])
    else:
        tbl = array("H", bytes(2 * nbuckets * bucket_size))
        overflow = False
    if len(hashes):
        hashes = np.sort(hashes)
        fp, i1, _ = _slots(hashes, nbuckets)
        if op == "insert":
            overflow = (
                _insert_all(tbl, fp, i1, nbuckets, bucket_size, max_kicks) or overflow
            )
        else:
            _delete_all(tbl, fp, i1, nbuckets, bucket_size)
    return pd.DataFrame(
        {
            "part": [key[0]],
            "cycle_id": [cycle_id],
            "nbuckets": [nbuckets],
            "bucket_size": [bucket_size],
            "overflow": [overflow],
            "bits": [tbl.tobytes()],
        }
    )


def _cogroup_op(
    keys: DataFrame, cuckoo: DataFrame, cycle_id: int, nbuckets: int,
    bucket_size: int, max_kicks: int, op: str,
) -> DataFrame:
    def body(key: tuple, new_pdf: pd.DataFrame, ck_pdf: pd.DataFrame) -> pd.DataFrame:
        return _apply(
            ck_pdf, key, new_pdf["url_hash"].to_numpy(np.int64), cycle_id,
            nbuckets, bucket_size, max_kicks, op,
        )

    touched = keys.select("part").distinct()
    changed = (
        keys.groupBy("part")
        .cogroup(cuckoo.join(touched, "part", "left_semi").groupBy("part"))
        .applyInPandas(body, schema=CUCKOO_SEEN)
    )
    untouched = cuckoo.join(touched, "part", "left_anti")
    return changed.unionByName(untouched)


def _native_cuckoo_loaded(spark) -> bool:
    from . import seen as seen_mod

    if not seen_mod._native_loaded(spark):
        return False
    try:
        spark._jvm.java.lang.Class.forName("crawlspark.nativejvm.CuckooFilter")
        return True
    except Exception:
        return False  # older jar without the cuckoo class


def fold_cuckoo_native(
    new_hashes: DataFrame, cuckoo: DataFrame, cycle_id: int,
    nbuckets: int, bucket_size: int, max_kicks: int, op: str = "insert",
) -> DataFrame | None:
    """Fold (or delete) with zero Python stages (native/src/
    CuckooFilter.scala): the per-part hash list is gathered JVM-side —
    sort_array(collect_list(...)), the same shuffle shape as the
    cogroup, since cuckoo layout depends on insert order and therefore
    cannot partial-aggregate like the Bloom OR — and a scalar JVM UDF
    applies the sorted sequential insert/delete. Bit-identical to the
    Python fold (property-tested). None when the jar isn't loaded.

    Registration pins nbuckets/bucket_size/max_kicks as constants, so
    callers must keep them fixed per sidecar (the engine does); the
    Python path reads them from the row instead."""
    spark = new_hashes.sparkSession
    if not _native_cuckoo_loaded(spark):
        return None
    spark._jvm.crawlspark.nativejvm.CuckooFilter.register(
        spark._jsparkSession, "crawlspark_cuckoo_fold",
        nbuckets, bucket_size, max_kicks,
    )
    grouped = new_hashes.groupBy("part").agg(
        F.sort_array(F.collect_list("url_hash")).alias("hs")
    )
    joined = grouped.join(cuckoo.select("part", "overflow", "bits"), "part", "left")
    if op == "insert":
        staged = joined.select(
            "part",
            F.expr(
                "crawlspark_cuckoo_fold(bits, coalesce(overflow, false), hs)"
            ).alias("_st"),
        )
        changed = staged.select(
            "part",
            F.lit(cycle_id).cast("long").alias("cycle_id"),
            F.lit(nbuckets).cast("long").alias("nbuckets"),
            F.lit(bucket_size).cast("int").alias("bucket_size"),
            F.col("_st._2").alias("overflow"),
            F.col("_st._1").alias("bits"),
        )
    else:
        # delete: rows must exist (targets are semi-joined against the
        # exact table, whose parts were folded); missing rows no-op out
        # via the inner join below, matching the cogroup's behavior
        joined = grouped.join(
            cuckoo.select("part", "cycle_id", "nbuckets", "bucket_size",
                          "overflow", "bits"),
            "part", "inner",
        )
        changed = joined.select(
            "part",
            F.lit(cycle_id).cast("long").alias("cycle_id"),
            "nbuckets", "bucket_size", "overflow",
            F.expr("crawlspark_cuckoo_fold_del(bits, hs)").alias("bits"),
        )
    untouched = cuckoo.join(grouped.select("part"), "part", "left_anti")
    out = changed.unionByName(untouched.select(*changed.columns))
    # JVM plans keep the input lineage (same caveat as fold_bloom_native):
    # re-alias every column so composing with overlapping sources never
    # trips the ambiguous-self-join check
    return out.select(*[F.col(c).alias(c) for c in out.columns])


def fold_cuckoo(
    new_hashes: DataFrame,  # columns: part int, url_hash long
    cuckoo: DataFrame,  # current cuckoo_seen table
    cycle_id: int,
    nbuckets: int = NBUCKETS_DEFAULT,
    bucket_size: int = BUCKET_SIZE,
    max_kicks: int = MAX_KICKS,
) -> DataFrame:
    """C5 analogue: insert this cycle's novel url_hashes into each
    partition's filter. Untouched parts keep their old row. Dispatches
    to the JVM fold when the native jar is loaded (same bits, no
    Python stage); the cogroup below is the universal fallback."""
    native = fold_cuckoo_native(
        new_hashes, cuckoo, cycle_id, nbuckets, bucket_size, max_kicks
    )
    if native is not None:
        return native
    return _cogroup_op(
        new_hashes, cuckoo, cycle_id, nbuckets, bucket_size, max_kicks, "insert"
    )


def delete_cuckoo(
    del_hashes: DataFrame,  # columns: part int, url_hash long
    cuckoo: DataFrame,
    cycle_id: int,
) -> DataFrame:
    """Remove keys from the sidecar in place — the operation a Bloom
    bitset cannot do (operators/seen.py rebuilds the part instead).
    Callers must pass only keys present in the exact table."""
    spark = del_hashes.sparkSession
    if _native_cuckoo_loaded(spark):
        # geometry from the table itself (delete has no config context);
        # one tiny collect — forgets are rare relative to folds
        first = cuckoo.select("nbuckets", "bucket_size").limit(1).collect()
        if first:
            native = fold_cuckoo_native(
                del_hashes, cuckoo, cycle_id,
                int(first[0][0]), int(first[0][1]), MAX_KICKS, op="delete",
            )
            if native is not None:
                return native
    return _cogroup_op(del_hashes, cuckoo, cycle_id, 0, 0, 0, "delete")


def cuckoo_prefilter_native(candidates: DataFrame, cuckoo: DataFrame) -> DataFrame | None:
    """Adds `maybe_seen` via the JVM-native probe (CuckooFilter.scala):
    tables collected + broadcast once, probed by a registered JVM UDF —
    no Python/Arrow on the per-URL hot path. None when the jar isn't
    loaded. Re-registration destroys the previous cycle's broadcast."""
    spark = candidates.sparkSession
    if not _native_cuckoo_loaded(spark):
        return None
    spark._jvm.crawlspark.nativejvm.CuckooFilter.registerProbe(
        spark._jsparkSession, cuckoo._jdf, "crawlspark_cuckoo_probe"
    )
    return candidates.withColumn(
        "maybe_seen", F.expr("crawlspark_cuckoo_probe(part, url_hash)")
    )


def cuckoo_prefilter_broadcast(candidates: DataFrame, cuckoo: DataFrame) -> DataFrame:
    """Adds `maybe_seen` via a broadcast probe (collect P × 2·nbuckets·
    bucket_size bytes once, vectorized numpy probe per Arrow batch) —
    same envelope as seen.bloom_prefilter_broadcast."""
    from . import seen as seen_mod

    spark = candidates.sparkSession
    tables = {
        int(r["part"]): (
            np.frombuffer(r["bits"], dtype=np.uint16),
            int(r["nbuckets"]),
            int(r["bucket_size"]),
            bool(r["overflow"]),
        )
        for r in cuckoo.collect()
    }
    bc = spark.sparkContext.broadcast(tables)
    seen_mod._BROADCASTS.append(bc)  # released by engine per cycle

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
                out[m] = _contains(e[0], hv[m], e[1], e[2], e[3])
        return pd.Series(out)

    return candidates.withColumn("maybe_seen", probe("part", "url_hash"))


def cuckoo_prefilter(candidates: DataFrame, cuckoo: DataFrame) -> DataFrame:
    """Cogrouped partition-local probe — the stays-distributed path for
    sidecars too big to broadcast."""
    cand_cols = candidates.schema.fieldNames()
    out_schema = T.StructType(
        list(candidates.schema.fields)
        + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )

    def probe(key: tuple, cand_pdf: pd.DataFrame, ck_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand_pdf) == 0:
            return pd.DataFrame(columns=[*cand_cols, "maybe_seen"])
        if len(ck_pdf) == 0:
            maybe = np.zeros(len(cand_pdf), dtype=bool)
        else:
            maybe = _contains(
                np.frombuffer(ck_pdf["bits"].iloc[0], dtype=np.uint16),
                cand_pdf["url_hash"].to_numpy(np.int64),
                int(ck_pdf["nbuckets"].iloc[0]),
                int(ck_pdf["bucket_size"].iloc[0]),
                bool(ck_pdf["overflow"].iloc[0]),
            )
        return cand_pdf.assign(maybe_seen=maybe)

    return (
        candidates.groupBy("part")
        .cogroup(cuckoo.groupBy("part"))
        .applyInPandas(probe, schema=out_schema)
    )


def seen_filter(
    candidates: DataFrame, url_seen: DataFrame, cuckoo: DataFrame,
    broadcast_filter: bool | None = None,
    seen_mirror: str | None = None,
) -> DataFrame:
    """C4 with the cuckoo sidecar: same exactness argument as
    seen.seen_filter — the filter only routes rows *toward* the exact
    anti-join (false positives, overflow parts), never around it."""
    from . import seen as seen_mod

    if broadcast_filter is None:
        first = cuckoo.select("nbuckets", "bucket_size").limit(1).collect()
        if first:
            row_bytes = 2 * int(first[0][0]) * int(first[0][1])
            broadcast_filter = (
                cuckoo.count() * row_bytes <= seen_mod.BROADCAST_BLOOM_MAX_BYTES
            )
        else:
            broadcast_filter = True
    if broadcast_filter:
        probed = cuckoo_prefilter_native(candidates, cuckoo)
        if probed is None:
            probed = cuckoo_prefilter_broadcast(candidates, cuckoo)
    else:
        probed = cuckoo_prefilter(candidates, cuckoo)
    definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
    if seen_mirror is not None:
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
