"""R28 hot-key-targeted skew join: result equivalence to the plain
join (the whole contract) and the salted shuffle shape when the build
side is too big to broadcast."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawlspark.operators import skew

SF = "/root/testdata/sf0.001"


def _tables(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_name"
    )
    return e, c


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_skew_join_equals_plain_join(spark):
    e, c = _tables(spark)
    hot = skew.hot_keys(e, "user_id", top=5)
    assert len(hot) == 5
    got = skew.skew_join(
        e.repartition(7), c, "user_id", "event_id", hot, n_salt=8
    ).select("event_id", "user_id", "c_name")
    want = e.join(c, "user_id").select("event_id", "user_id", "c_name")
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_skew_join_left_outer(spark):
    """Cold/unmatched probe rows survive a left join exactly once
    (salt 0 matches the single cold replica; hot keys match exactly
    the replica carrying their salt)."""
    e, c = _tables(spark)
    hot = skew.hot_keys(e, "user_id", top=3)
    # drop some build keys to create unmatched probe rows
    c2 = c.filter(F.col("user_id") % 3 != 0)
    got = skew.skew_join(e, c2, "user_id", "event_id", hot, n_salt=4, how="left")
    want = e.join(c2, "user_id", "left")
    assert (
        _rows(got.select("event_id", "user_id", "c_name"))
        == _rows(want.select("event_id", "user_id", "c_name"))
    )


def test_skew_join_shuffle_carries_salt(spark):
    """With broadcast disabled (the 100 TB build side), the exchange
    must hash-partition on (key, salt) — the hot key's rows land on
    n_salt reducers, not one."""
    e, c = _tables(spark)
    hot = skew.hot_keys(e, "user_id", top=5)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = skew.skew_join(e, c, "user_id", "event_id", hot, n_salt=8)
        p = j._jdf.queryExecution().explainString(
            j._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "_skew_salt" in p
        # the partitioning expressions of the shuffle include the salt
        part = [ln for ln in p.splitlines() if "hashpartitioning" in ln]
        assert any("_skew_salt" in ln for ln in part), part
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
