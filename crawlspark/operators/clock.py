"""C39 second-chance/clock frontier eviction — the bounded-frontier
discard policy (the page-replacement CLOCK algorithm applied to the
pending URL ring, as frontier implementations like Heritrix's bounded
queues and the classic Mercator design motivate).

Pending entries form a ring in admission-seq order. A hand persists
across sweeps (`clock_state`): each sweep scans cyclically from the
hand, granting referenced entries (URLs re-discovered while pending —
their duplicate candidates set a reference bit) one second chance
(bit clears, entry survives) and evicting unreferenced entries until
the cap holds. A sweep whose first lap runs dry wraps: every
survivor's bit is now clear, so the same ring order yields lap-2
evictions. Evicted URLs stay in the seen set — the standard
bounded-frontier discard (accepted once, never fetched).

The sequential rule is ``refsim.clock_sweep_py``; this module is its
distributed twin, differential-tested on constructed ring states
(both laps, wrap-around, empty-bits) in tests/test_clock_eviction.py.

Scale shape (10^10-URL frontier): the sweep never materializes a
global sort. Both laps reduce to ORDER STATISTICS — "the E-th
unreferenced entry in ring order" — found with the same two-phase
distributed rank as C18 seq assignment (range-partition on the ring
key, driver collects per-partition COUNTS plus ONE threshold row);
everything else is narrow filters against the two collected scalars.
Ref-bit state is append-only deltas between sweeps and is overwritten
to the surviving set (≤ pending size) only when a sweep fires; at
10^10 pending the ref-bit and eviction tables take the same
bucketed-mirror treatment as url_seen (C5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schedule import rank_seq, register_scratch

KEYS = ["url_hash", "url_norm"]


def clock_sweep(
    pend: DataFrame, ref_state: DataFrame, n_evict: int, hand: int,
    distributed: bool = False,
) -> tuple[DataFrame, DataFrame, int]:
    """One clock sweep over the pending ring.

    ``pend``: (url_hash, url_norm, seq) pending entries; ``ref_state``:
    (url_hash, url_norm) currently-referenced URLs; ``n_evict``: how
    many must go; ``hand``: the seq the ring starts at.

    Returns ``(evicted, bits_kept, new_hand)``: evicted rows with their
    lap (1 = unreferenced, 2 = evicted after its second chance on the
    wrapped lap), the surviving set-bits (referenced entries the hand
    never reached — everything it passed is cleared), and the seq the
    next sweep resumes at. One driver action (a combined
    count+threshold aggregate; one more when the lap wraps), plus the
    ranks' own per-partition-count collects on the distributed
    path."""
    p = (
        pend.join(ref_state.withColumn("_r", F.lit(True)), KEYS, "left")
        .withColumn("ref", F.coalesce(F.col("_r"), F.lit(False)))
        .drop("_r")
        .withColumn(
            "ring0", F.when(F.col("seq") >= F.lit(hand), 0).otherwise(1)
        )
        .persist()
    )
    # scratch-registered like rank_seq's range stage: the returned
    # frames are staged into the cycle's transaction, so the engine
    # releases the cache only after the commit (schedule.
    # release_scratch — library callers own that call, see
    # register_scratch)
    register_scratch(p)
    ring = ["ring0", "seq"]
    unref = p.filter(~F.col("ref"))
    ranked = rank_seq(unref, 0, ring, distributed, out_col="_rpos")
    # ONE action yields both the unreferenced count z (max rank) and
    # the lap-1 threshold (the n_evict-th entry's ring position) —
    # sweeps run at micro-batch cadence, so every saved driver action
    # is a task wave
    th = ranked.agg(
        F.coalesce(F.max("_rpos"), F.lit(0)).alias("z"),
        F.max(F.when(F.col("_rpos") == n_evict, F.col("ring0"))).alias("r0"),
        F.max(F.when(F.col("_rpos") == n_evict, F.col("seq"))).alias("s"),
    ).collect()[0]
    z = int(th["z"])
    if n_evict <= z:
        # lap 1 alone: evict the first n_evict unreferenced entries in
        # ring order; the hand stops at the n_evict-th, so referenced
        # entries BEFORE it lose their bit and ones beyond keep it
        before = (F.col("ring0") < th["r0"]) | (
            (F.col("ring0") == th["r0"]) & (F.col("seq") < th["s"])
        )
        evicted = (
            ranked.filter(F.col("_rpos") <= n_evict)
            .select(*KEYS, "seq")
            .withColumn("lap", F.lit(1))
        )
        bits_kept = p.filter(F.col("ref") & ~before).select(*KEYS)
        return evicted, bits_kept, int(th["s"]) + 1
    # the first lap runs dry: all z unreferenced entries evict, every
    # referenced entry is passed (bit cleared), and the wrapped hand
    # takes the first n_evict - z survivors in the same ring order
    ev1 = unref.select(*KEYS, "seq").withColumn("lap", F.lit(1))
    rest = p.filter(F.col("ref"))
    k2 = n_evict - z
    ranked2 = rank_seq(rest, 0, ring, distributed, out_col="_rpos")
    th2 = ranked2.filter(F.col("_rpos") == k2).select("seq").collect()[0]
    ev2 = (
        ranked2.filter(F.col("_rpos") <= k2)
        .select(*KEYS, "seq")
        .withColumn("lap", F.lit(2))
    )
    bits_kept = p.filter(F.lit(False)).select(*KEYS)
    return ev1.unionByName(ev2), bits_kept, int(th2["seq"]) + 1
