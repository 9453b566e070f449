"""R28 hot-key-targeted skew join.

AQE's skew-join split handles moderate skew at runtime; this is the
explicit production pattern for the pathological case AQE can't fix —
a handful of keys so hot that even a split partition's build side is
one task's memory. Salt ONLY the detected hot keys on the probe side
and replicate ONLY the hot keys' build rows n_salt times, so a hot
key's probe rows spread over n_salt reducers while the (usually vast)
cold tail pays nothing: no blanket replication, no wasted shuffle
width. Result is row-identical to the plain equi-join under any
layout.

At 100 TB: hot-key detection is a partial-agg count over the probe
side's join column only (column-pruned scan), the hot list is by
construction tiny (it's the keys a single reducer can't hold, there
are at most a few), so it rides into the plan as a literal array —
no extra shuffle, no driver-side data structure beyond the list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_skew_salt"


def hot_keys(df: DataFrame, key: str, top: int = 5) -> list:
    """The `top` most frequent join keys, deterministically ordered
    (count desc, key asc). One column-pruned partial-agg scan; the
    collect is bounded by `top` (a scalar-sized list, never data)."""
    rows = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc(key))
        .limit(top)
        .collect()
    )
    return [r[0] for r in rows]


def skew_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_by: str | Column,
    hot: list,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `probe` ⋈ `build` on `key`, spreading each key in
    `hot` across `n_salt` reducers.

    Probe side: hot rows get salt = xxhash64(salt_by) mod n_salt
    (`salt_by` must be row-stable — an id column — so a retried task
    re-draws the same salt); cold rows get salt 0. Build side: hot
    rows are replicated once per salt value, cold rows once. The join
    key becomes (key, salt), so the shuffle partitioner sees n_salt
    distinct values where the hot key was one. Every probe row still
    matches exactly the build replicas carrying its salt ⇒ the result
    multiset equals the plain join's.
    """
    hot_arr = F.array(*[F.lit(k) for k in hot])
    is_hot = F.array_contains(hot_arr, F.col(key))
    p = probe.withColumn(
        SALT,
        F.when(is_hot, F.pmod(F.xxhash64(salt_by), F.lit(n_salt)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    b = build.withColumn(
        SALT,
        F.explode(
            F.when(is_hot, F.sequence(F.lit(0), F.lit(n_salt - 1)))
            .otherwise(F.array(F.lit(0)))
        ),
    )
    return p.join(b, [key, SALT], how).drop(SALT)
