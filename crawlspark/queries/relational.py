"""Relational operator surface (SURVEY.md §2.2 R1–R24, §2.3, §2.4
batch proxies) as driver-checked query/oracle pairs over the testdata
star schema. Each query is the smallest plan that exercises the
operator the way the crawl cycle uses it (broadcast joins for dims,
window dedup, anti-join seen-filter shape, …).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.asof import asof_join_backward


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from . import pin_session

    pin_session(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- R12 hash aggregate (TPC-H Q1 shape) ---------------------------------

def q01_pricing_summary(spark, sf):
    return (
        T(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL01 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# --- R1/R4/R5 scan + filter pushdown + project/cast ----------------------

def q02_filter_project(spark, sf):
    return (
        T(spark, sf, "lineitem")
        .filter(
            (F.col("l_returnflag") == "R")
            & F.col("l_quantity").between(10, 20)
            & (F.col("l_discount") < 0.05)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("int").alias("qty_int"),
            "l_extendedprice",
        )
    )


SQL02 = """
SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INT) AS qty_int, l_extendedprice
FROM lineitem
WHERE l_returnflag = 'R' AND l_quantity BETWEEN 10 AND 20 AND l_discount < 0.05
"""


# --- R6 broadcast join chain ---------------------------------------------

def q03_revenue_by_nation(spark, sf):
    c, n, o = (T(spark, sf, t) for t in ("customer", "nation", "orders"))
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


SQL03 = """
SELECT n_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --- R7 shuffle (sort-merge) join on the fact tables ---------------------

def q04_order_priority(spark, sf):
    li, o = T(spark, sf, "lineitem"), T(spark, sf, "orders")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


SQL04 = """
SELECT o_orderpriority, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# --- R8 left anti join (the C4 seen-filter shape) ------------------------

def q05_customers_without_orders(spark, sf):
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


SQL05 = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- R9 left semi join ----------------------------------------------------

def q06_parts_with_bulk_orders(spark, sf):
    p, li = T(spark, sf, "part"), T(spark, sf, "lineitem")
    bulk = li.filter(F.col("l_quantity") > 45)
    return p.join(bulk, p["p_partkey"] == bulk["l_partkey"], "left_semi").select(
        "p_partkey", "p_brand"
    )


SQL06 = """
SELECT p_partkey, p_brand FROM part
WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_quantity > 45)
"""


# --- R10 range join (equi + residual range predicate) --------------------

def q07_ship_latency(spark, sf):
    li, o = T(spark, sf, "lineitem"), T(spark, sf, "orders")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).filter(
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).between(0, 60)
    )
    return j.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        F.count("*").alias("n_shipped")
    )


SQL07 = """
SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n_shipped
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE datediff('day', o_orderdate, l_shipdate) BETWEEN 0 AND 60
GROUP BY 1
"""


# --- R11 cross join (tiny dims only) -------------------------------------

def q08_region_status_grid(spark, sf):
    r = T(spark, sf, "region").select("r_name")
    s = T(spark, sf, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s)


SQL08 = """
SELECT r_name, o_orderstatus
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
"""


# --- R13 distinct / count-distinct ---------------------------------------

def q09_distinct_users(spark, sf):
    return (
        T(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


SQL09 = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""


# --- R14 rollup -----------------------------------------------------------

def q10_rollup_orders(spark, sf):
    return (
        T(spark, sf, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "n",
            "total",
        )
    )


SQL10 = """
SELECT coalesce(o_orderstatus, '(all)') AS status,
       coalesce(o_orderpriority, '(all)') AS priority,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# --- R14 cube -------------------------------------------------------------

def q11_cube_events(spark, sf):
    e = T(spark, sf, "events").withColumn("month", F.date_format("ts", "yyyy-MM"))
    return (
        e.cube("event_type", "month")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("event_type", F.lit("(all)")).alias("event_type"),
            F.coalesce("month", F.lit("(all)")).alias("month"),
            "n",
        )
    )


SQL11 = """
SELECT coalesce(event_type, '(all)') AS event_type,
       coalesce(m, '(all)') AS month, count(*) AS n
FROM (SELECT event_type, strftime(ts, '%Y-%m') AS m FROM events)
GROUP BY CUBE (event_type, m)
"""


# --- R15 window ranking (the C9 per-host top-k shape) --------------------

def q12_top_orders_per_cust(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        T(spark, sf, "orders")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


SQL12 = """
SELECT o_custkey, o_orderkey, rnk FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders) WHERE rnk <= 3
"""


# --- R16 analytic window (lag + running frame) ---------------------------

def q13_running_total(spark, sf):
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    return T(spark, sf, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.sum("o_totalprice").over(wf), 2).alias("running_total"),
        F.row_number().over(w).alias("order_idx"),
    )


SQL13 = """
SELECT o_custkey, o_orderkey,
       round(lag(o_totalprice) OVER w, 2) AS prev_price,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2) AS running_total,
       row_number() OVER w AS order_idx
FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


# --- R17/R18 global sort + top-k ------------------------------------------

def q14_topk_orders(spark, sf):
    return (
        T(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


SQL14 = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
"""


# --- R19 union ------------------------------------------------------------

def q15_union_nations(spark, sf):
    c = T(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


SQL15 = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
"""


# --- R20 except / intersect ----------------------------------------------

def q16_except_negative(spark, sf):
    o = T(spark, sf, "orders").select(F.col("o_custkey").alias("custkey")).distinct()
    neg = (
        T(spark, sf, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.exceptAll(neg.distinct()).distinct()


SQL16 = """
SELECT DISTINCT o_custkey AS custkey FROM orders
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal < 0
"""


def q27_intersect_nations(spark, sf):
    c = T(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


SQL27 = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
"""


# --- R21 explode over array columns --------------------------------------

def q17_vector_stats(spark, sf):
    e = T(spark, sf, "embeddings").select("vec_id", F.explode("embedding").alias("v"))
    return e.groupBy("vec_id").agg(
        F.count("*").alias("dim"),
        F.round(F.avg("v"), 4).alias("mean_v"),
        F.round(F.max("v"), 6).alias("max_v"),
    )


SQL17 = """
SELECT vec_id, count(*) AS dim, round(avg(v), 4) AS mean_v, round(max(v), 6) AS max_v
FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) GROUP BY vec_id
"""


# --- R22 pivot ------------------------------------------------------------

def q18_doc_pivot(spark, sf):
    return (
        T(spark, sf, "documents")
        .groupBy("lang")
        .pivot("source", ["src0", "src1", "src2", "src3", "src4"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "lang",
            *[F.col(f"src{i}").cast("long").alias(f"src{i}_n") for i in range(5)],
        )
    )


SQL18 = """
SELECT lang,
       count(*) FILTER (source = 'src0') AS src0_n,
       count(*) FILTER (source = 'src1') AS src1_n,
       count(*) FILTER (source = 'src2') AS src2_n,
       count(*) FILTER (source = 'src3') AS src3_n,
       count(*) FILTER (source = 'src4') AS src4_n
FROM documents GROUP BY lang
"""


# --- R22 unpivot (stack) — the pivot round-trip ---------------------------

def q45_doc_unpivot(spark, sf):
    wide = q18_doc_pivot(spark, sf)
    return wide.select(
        "lang",
        F.expr(
            "stack(5, 'src0_n', src0_n, 'src1_n', src1_n, 'src2_n', src2_n,"
            " 'src3_n', src3_n, 'src4_n', src4_n) AS (source, n)"
        ),
    )


SQL45 = f"""
SELECT lang, source, n FROM ({SQL18}) w
UNPIVOT (n FOR source IN (src0_n, src1_n, src2_n, src3_n, src4_n))
"""


# --- R23 window dedup-keep-first (C15 shape) ------------------------------

def q19_first_event(spark, sf):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        T(spark, sf, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"))
    )


SQL19 = """
SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM (
  SELECT user_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events) WHERE rn = 1
"""


# --- §2.3 JSON functions --------------------------------------------------

def q20_json_props(spark, sf):
    e = T(spark, sf, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )
    return e.groupBy("event_type").agg(
        F.round(F.avg("k"), 4).alias("avg_k"),
        F.max("k").alias("max_k"),
        F.count("*").alias("n"),
    )


SQL20 = """
SELECT event_type, round(avg(k), 4) AS avg_k, max(k) AS max_k, count(*) AS n
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
GROUP BY event_type
"""


# --- S3 batch proxy: tumbling event-time windows -------------------------

def q21_event_windows(spark, sf):
    e = T(spark, sf, "events").withColumn(
        "win_start", (F.floor(F.unix_timestamp("ts") / 21600) * 21600).cast("long")
    )
    return e.groupBy("win_start", "event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


SQL21 = """
SELECT CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS win_start, event_type,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


# --- S4 batch proxy: session windows (gap-based) -------------------------

def q22_sessionize(spark, sf):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    e = (
        T(spark, sf, "events")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ts").isNull()
                | (F.unix_millis(F.col("ts").cast("timestamp")) - F.unix_millis(F.col("prev_ts").cast("timestamp")) > 1800000),
                1,
            ).otherwise(0),
        )
        .withColumn("sess_id", F.sum("new_sess").over(wf))
    )
    per_sess = e.groupBy("user_id", "sess_id").agg(F.count("*").alias("len"))
    return per_sess.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"), F.max("len").alias("max_session_events")
    )


SQL22 = """
WITH x AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events),
s AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
              THEN 1 ELSE 0 END AS new_sess
  FROM x),
c AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM s),
p AS (SELECT user_id, sess_id, count(*) AS len FROM c GROUP BY 1, 2)
SELECT user_id, count(*) AS n_sessions, max(len) AS max_session_events
FROM p GROUP BY user_id
"""


# --- §2.3 string functions ------------------------------------------------

def q23_doc_strings(spark, sf):
    d = T(spark, sf, "documents").withColumn(
        "first_word", F.upper(F.element_at(F.split(F.trim("text"), " "), 1))
    )
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
        F.countDistinct("first_word").alias("n_first_words"),
    )


SQL23 = """
SELECT lang, count(*) AS n_docs, round(avg(length(text)), 4) AS avg_chars,
       count(DISTINCT upper((string_split(trim(text), ' '))[1])) AS n_first_words
FROM documents GROUP BY lang
"""


# --- §2.3 hash functions --------------------------------------------------

def q24_hash_md5(spark, sf):
    return (
        T(spark, sf, "customer")
        .filter(F.col("c_custkey") < 100)
        .select("c_custkey", F.md5(F.col("c_name")).alias("name_md5"))
    )


SQL24 = """
SELECT c_custkey, md5(c_name) AS name_md5 FROM customer WHERE c_custkey < 100
"""


# --- R10 as-of join (custom operator; DuckDB native ASOF) ----------------

def q25_asof_orders(spark, sf):
    e = T(spark, sf, "events").filter(F.col("event_type") == "purchase")
    o = T(spark, sf, "orders")
    j = asof_join_backward(
        e.select("event_id", "user_id", "ts"),
        o.select(F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey", "o_totalprice"),
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
        tie_col="o_orderkey",
    )
    return j.select(
        "event_id", "user_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"), "o_orderkey", "o_totalprice"
    )


SQL25 = """
WITH r AS (
  SELECT o_custkey AS user_id, o_orderdate, o_orderkey, o_totalprice FROM (
    SELECT *, row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                 ORDER BY o_orderkey DESC) AS rn
    FROM orders) WHERE rn = 1)
SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms, r.o_orderkey, r.o_totalprice
FROM (SELECT * FROM events WHERE event_type = 'purchase') e
ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
"""


# --- §2.3 string distance / formatting -----------------------------------

def q28_string_funcs(spark, sf):
    n = T(spark, sf, "nation")
    return n.select(
        "n_nationkey",
        F.levenshtein(F.col("n_name"), F.lit("UNITED STATES")).alias("lev_us"),
        F.format_string("%03d-%s", F.col("n_nationkey"), F.lower("n_name")).alias("tag"),
        F.substring("n_name", 1, 3).alias("pre3"),
        F.reverse(F.col("n_name")).alias("rev"),
        F.translate("n_name", "AEIOU", "aeiou").alias("tr"),
    )


SQL28 = """
SELECT n_nationkey,
       levenshtein(n_name, 'UNITED STATES') AS lev_us,
       printf('%03d-%s', n_nationkey, lower(n_name)) AS tag,
       substr(n_name, 1, 3) AS pre3,
       reverse(n_name) AS rev,
       translate(n_name, 'AEIOU', 'aeiou') AS tr
FROM nation
"""


# --- §2.3 date/time arithmetic -------------------------------------------

def q29_date_funcs(spark, sf):
    o = T(spark, sf, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.quarter("o_orderdate").alias("qtr"),
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct(F.dayofweek("o_orderdate")).alias("n_dows"),
        F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("first_day"),
    )


SQL29 = """
SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
       count(*) AS n,
       count(DISTINCT dayofweek(o_orderdate) + 1) AS n_dows,
       min(strftime(o_orderdate, '%Y-%m-%d')) AS first_day
FROM orders GROUP BY 1, 2
"""


# --- §2.3 array higher-order functions -----------------------------------

def q30_array_funcs(spark, sf):
    e = T(spark, sf, "embeddings")
    v = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(v).alias("dim"),
        F.round(F.element_at(v, 1).cast("double"), 6).alias("first_v"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(v, F.lit(0.0), lambda a, x: a + F.abs(x.cast("double"))), 4
        ).alias("l1"),
        F.round(F.array_max(v).cast("double"), 6).alias("mx"),
    )


SQL30 = """
SELECT vec_id, len(embedding) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_v,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       round(list_reduce(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                         (a, b) -> a + b), 4) AS l1,
       round(CAST(list_max(embedding) AS DOUBLE), 6) AS mx
FROM embeddings
"""


# --- §2.3 map functions (props json -> map) ------------------------------

def q31_map_funcs(spark, sf):
    e = T(spark, sf, "events").withColumn(
        "m", F.from_json("props", "map<string,int>")
    )
    return e.select(
        "event_id",
        F.size(F.map_keys("m")).alias("n_keys"),
        F.element_at("m", "k").alias("k_val"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_csv"),
    )


SQL31 = """
SELECT event_id,
       len(json_keys(props)) AS n_keys,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
       array_to_string(list_sort(json_keys(props)), ',') AS keys_csv
FROM events
"""


# --- §2.3 conditionals ----------------------------------------------------

def q32_conditionals(spark, sf):
    li = T(spark, sf, "lineitem")
    return (
        li.withColumn(
            "bucket",
            F.when(F.col("l_quantity") < 10, "low")
            .when(F.col("l_quantity") < 30, "mid")
            .otherwise("high"),
        )
        .withColumn("flag", F.nullif(F.col("l_returnflag"), F.lit("N")))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.count("flag").alias("n_flagged"),
            F.round(F.sum(F.coalesce(F.col("l_discount"), F.lit(0.0))), 4).alias("disc_sum"),
        )
    )


SQL32 = """
SELECT CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS bucket,
       count(*) AS n,
       count(nullif(l_returnflag, 'N')) AS n_flagged,
       round(sum(coalesce(l_discount, 0.0)), 4) AS disc_sum
FROM lineitem GROUP BY 1
"""


# --- R14 grouping sets (explicit) ----------------------------------------

def q33_grouping_sets(spark, sf):
    o = T(spark, sf, "orders")
    o.createOrReplaceTempView("orders_gs")
    return o.sparkSession.sql(
        """
        SELECT coalesce(o_orderstatus, '(all)') AS status,
               coalesce(o_orderpriority, '(all)') AS priority,
               count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


SQL33 = """
SELECT coalesce(o_orderstatus, '(all)') AS status,
       coalesce(o_orderpriority, '(all)') AS priority,
       count(*) AS n
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- TPC-H Q3 shape: 3-way join + filter + grouped top-k -----------------

def q38_shipping_priority(spark, sf):
    c = T(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = T(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    )
    rev = j.groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc()).limit(10)


SQL38 = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY 1, 2
ORDER BY revenue DESC, l_orderkey ASC LIMIT 10
"""


# --- TPC-H Q5 shape: 6-way join with correlated nation filter ------------

def q39_local_supplier_volume(spark, sf):
    r = T(spark, sf, "region")
    n = T(spark, sf, "nation")
    c = T(spark, sf, "customer")
    s = T(spark, sf, "supplier")
    o = T(spark, sf, "orders")
    li = T(spark, sf, "lineitem")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return j.groupBy("r_name", "n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


SQL39 = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name, n_name
"""


# --- P18 bucketed co-located anti-join -----------------------------------

def q26_bucketed_antijoin(spark, sf):
    """The C4 seen-filter against a bucketed managed-table mirror
    (operators/bucketing.py): at scale the mirror side is never
    shuffled — plan asserted in tests/test_plans.py; value parity
    checked here."""
    from ..operators import bucketing

    early = (
        T(spark, sf, "orders")
        .filter(F.col("o_orderdate") < "1996-01-01")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    bucketing.write_bucketed(early, "orders_early_bucketed", "custkey", 8)
    cand = T(spark, sf, "customer").select(F.col("c_custkey").alias("custkey"))
    return bucketing.colocated_anti_join(cand, spark, "orders_early_bucketed", ["custkey"])


SQL26 = """
SELECT c_custkey AS custkey FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderdate < TIMESTAMP '1996-01-01')
"""


# --- R2 JSON / CSV scans with explicit schema ----------------------------

_SEED_JSON = "/tmp/crawlspark_seed_scan.jsonl"
_SEED_CSV = "/tmp/crawlspark_seed_scan.csv"


def _write_seed_files():
    from ..synth import T2

    seeds = T2.seeds()
    with open(_SEED_JSON, "w") as f:
        for i, u in enumerate(seeds):
            f.write('{"pos": %d, "url": "%s"}\n' % (i, u))
    with open(_SEED_CSV, "w") as f:
        f.write("pos,url\n")
        for i, u in enumerate(seeds):
            f.write(f"{i},{u}\n")


def q35_json_scan(spark, sf):
    """R2: seed-list ingestion — JSON lines with an explicit schema
    (never inferred in prod), host extracted JVM-side."""
    _write_seed_files()
    df = spark.read.schema("pos long, url string").json(_SEED_JSON)
    return df.select(
        "pos", "url", F.lower(F.parse_url("url", F.lit("HOST"))).alias("host")
    )


SQL35 = f"""
SELECT pos, url,
       lower(regexp_extract(url, '^[a-zA-Z]+://([^/:]+)', 1)) AS host
FROM read_json('{_SEED_JSON}', columns = {{'pos': 'BIGINT', 'url': 'VARCHAR'}})
"""


def q36_csv_scan(spark, sf):
    _write_seed_files()
    df = (
        spark.read.schema("pos long, url string")
        .option("header", "true")
        .csv(_SEED_CSV)
    )
    return df.select("pos", F.length("url").alias("url_len"))


SQL36 = f"""
SELECT pos, length(url) AS url_len
FROM read_csv('{_SEED_CSV}', header = true, columns = {{'pos': 'BIGINT', 'url': 'VARCHAR'}})
"""


# --- R14 consolidated: rollup + cube + grouping sets in one query --------
# (window-budget consolidation: the driver correctness harness records
# only the first ~50 registry entries, so the three grouping-family
# queries q10/q11/q33 are folded into this single tagged union; the
# originals stay registered in the tail for granular local checking)

def q10_group_families(spark, sf):
    o = T(spark, sf, "orders")
    o.createOrReplaceTempView("orders_gf")
    return o.sparkSession.sql(
        """
        SELECT 'rollup' AS src, coalesce(o_orderstatus, '(all)') AS status,
               coalesce(o_orderpriority, '(all)') AS priority, count(*) AS n
        FROM orders_gf GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        UNION ALL
        SELECT 'cube' AS src, coalesce(o_orderstatus, '(all)') AS status,
               coalesce(o_orderpriority, '(all)') AS priority, count(*) AS n
        FROM orders_gf GROUP BY CUBE (o_orderstatus, o_orderpriority)
        UNION ALL
        SELECT 'gsets' AS src, coalesce(o_orderstatus, '(all)') AS status,
               coalesce(o_orderpriority, '(all)') AS priority, count(*) AS n
        FROM orders_gf
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


SQL10F = """
SELECT 'rollup' AS src, coalesce(o_orderstatus, '(all)') AS status,
       coalesce(o_orderpriority, '(all)') AS priority, count(*) AS n
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
UNION ALL
SELECT 'cube' AS src, coalesce(o_orderstatus, '(all)') AS status,
       coalesce(o_orderpriority, '(all)') AS priority, count(*) AS n
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
UNION ALL
SELECT 'gsets' AS src, coalesce(o_orderstatus, '(all)') AS status,
       coalesce(o_orderpriority, '(all)') AS priority, count(*) AS n
FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- R19/R20 consolidated: union + intersect + except in one query -------

def q15_setops(spark, sf):
    c = T(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = T(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    big = T(spark, sf, "customer").filter(F.col("c_acctbal") > 9000).select(
        F.col("c_nationkey").alias("nationkey")
    )
    u = c.unionByName(s).distinct().withColumn("op", F.lit("union"))
    i = c.intersect(s).withColumn("op", F.lit("intersect"))
    x = c.distinct().exceptAll(big.distinct()).distinct().withColumn("op", F.lit("except"))
    return u.unionByName(i).unionByName(x).select("op", "nationkey")


SQL15S = """
SELECT 'union' AS op, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'intersect' AS op, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer
  INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'except' AS op, nationkey FROM (
  SELECT DISTINCT c_nationkey AS nationkey FROM customer
  EXCEPT SELECT c_nationkey FROM customer WHERE c_acctbal > 9000)
"""


# --- R2 consolidated: JSON + CSV scans joined in one query ---------------

def q35_semi_scan(spark, sf):
    """R2 both formats: seed list read from JSON lines AND CSV with
    explicit schemas (never inferred in prod), joined on position."""
    _write_seed_files()
    j = spark.read.schema("pos long, url string").json(_SEED_JSON)
    c = (
        spark.read.schema("pos long, url string")
        .option("header", "true")
        .csv(_SEED_CSV)
        .select("pos", F.length("url").alias("url_len"))
    )
    return j.join(c, "pos").select(
        "pos", "url",
        F.lower(F.parse_url("url", F.lit("HOST"))).alias("host"),
        "url_len",
    )


SQL35S = f"""
SELECT j.pos, j.url,
       lower(regexp_extract(j.url, '^[a-zA-Z]+://([^/:]+)', 1)) AS host,
       length(c.url) AS url_len
FROM read_json('{_SEED_JSON}', columns = {{'pos': 'BIGINT', 'url': 'VARCHAR'}}) j
JOIN read_csv('{_SEED_CSV}', header = true, columns = {{'pos': 'BIGINT', 'url': 'VARCHAR'}}) c
  ON j.pos = c.pos
"""


# --- R24 sample (rows-only: sampling algorithms differ by engine) --------

def q37_sample(spark, sf):
    s = T(spark, sf, "lineitem").sample(fraction=0.1, seed=42)
    return s.agg(
        F.count("*").alias("n_sampled"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


# --- R13 approx_count_distinct (HLL; rows-only — sketches differ) --------

def q34_approx_distinct(spark, sf):
    e = T(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )


# --- exact percentiles / median (R25) --------------------------------------

def q65_percentiles(spark, sf):
    """Exact interpolated percentiles of per-doc token counts by
    source (R25): Spark `percentile` == DuckDB `quantile_cont`.
    Parity: the probe points are exact binary fractions (.25/.5/.75),
    and token counts are small integers, so the a + f*(b-a) vs
    (1-f)*a + f*b associations both evaluate exactly — no rounding
    needed. Scale: percentile is a sort-based aggregate within each
    group; groups are bounded (sources), rows shuffle once."""
    from ..portable import words

    d = T(spark, sf, "documents").select(
        "source", F.size(words("text")).alias("n")
    )
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.percentile("n", 0.25).alias("p25"),
        F.median("n").alias("p50"),
        F.percentile("n", 0.75).alias("p75"),
    )


SQL65 = """
SELECT source, count(*) AS n_docs,
       quantile_cont(n, 0.25) AS p25,
       quantile_cont(n, 0.50) AS p50,
       quantile_cont(n, 0.75) AS p75
FROM (SELECT source, len(string_split(trim(text), ' ')) AS n FROM documents)
GROUP BY source
"""


# --- R27 table profiling (Deequ-style ingest sanity pass) ------------------

_PROFILE_COLS = ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
                 "l_shipdate"]


def profile(df, cols: list[str]):
    """R27 column profiling: per-column row/null/distinct counts and
    min/max (as strings) — the sanity pass any 100 TB ingest runs
    before committing a source. ONE aggregation pass over the table
    computes every stat as a partial aggregate (count/min/max combine
    map-side; the exact distinct counts share one Expand — the price
    of exactness, documented; swap in approx_count_distinct for a
    single-pass sketch at 10^12 rows). The wide 1-row result is then
    reshaped to one-row-per-column with `stack` — pure JVM on a single
    row, no second scan, no driver loop."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in cols
    )
    return one.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack}) AS "
        "(col_name, n_null, n_distinct, min_val, max_val)",
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")


def q96_profile(spark, sf):
    return profile(T(spark, sf, "lineitem"), _PROFILE_COLS)


SQL96 = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_val,
       CAST(max({c}) AS VARCHAR) AS max_val
FROM lineitem"""
    for c in _PROFILE_COLS
)


# --- R28 hot-key-targeted skew join ----------------------------------------

def q98_skew_join(spark, sf):
    """R28 (operators/skew.py): events ⋈ customer with the top-5
    hottest user_ids salted across 8 reducers and only their build
    rows replicated. Row-identical to the plain join — which is
    exactly what the oracle checks; the salted shuffle shape is
    asserted in tests/test_skew.py."""
    from ..operators import skew

    e = T(spark, sf, "events")
    c = T(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_nationkey"
    )
    hot = skew.hot_keys(e, "user_id", top=5)
    j = skew.skew_join(e, c, "user_id", "event_id", hot, n_salt=8)
    return j.select("event_id", "user_id", "c_name", "c_nationkey", "value")


SQL98 = """
SELECT e.event_id, e.user_id, c.c_name, c.c_nationkey, e.value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
"""


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q65_percentiles": q65_percentiles,
    "q02_filter_project": q02_filter_project,
    "q03_revenue_by_nation": q03_revenue_by_nation,
    "q04_order_priority": q04_order_priority,
    "q05_customers_without_orders": q05_customers_without_orders,
    "q06_parts_with_bulk_orders": q06_parts_with_bulk_orders,
    "q07_ship_latency": q07_ship_latency,
    "q08_region_status_grid": q08_region_status_grid,
    "q09_distinct_users": q09_distinct_users,
    "q10_group_families": q10_group_families,
    "q15_setops": q15_setops,
    "q35_semi_scan": q35_semi_scan,
    "q10_rollup_orders": q10_rollup_orders,
    "q11_cube_events": q11_cube_events,
    "q12_top_orders_per_cust": q12_top_orders_per_cust,
    "q13_running_total": q13_running_total,
    "q14_topk_orders": q14_topk_orders,
    "q15_union_nations": q15_union_nations,
    "q16_except_negative": q16_except_negative,
    "q17_vector_stats": q17_vector_stats,
    "q18_doc_pivot": q18_doc_pivot,
    "q19_first_event": q19_first_event,
    "q20_json_props": q20_json_props,
    "q21_event_windows": q21_event_windows,
    "q22_sessionize": q22_sessionize,
    "q23_doc_strings": q23_doc_strings,
    "q24_hash_md5": q24_hash_md5,
    "q25_asof_orders": q25_asof_orders,
    "q26_bucketed_antijoin": q26_bucketed_antijoin,
    "q27_intersect_nations": q27_intersect_nations,
    "q28_string_funcs": q28_string_funcs,
    "q29_date_funcs": q29_date_funcs,
    "q30_array_funcs": q30_array_funcs,
    "q31_map_funcs": q31_map_funcs,
    "q32_conditionals": q32_conditionals,
    "q33_grouping_sets": q33_grouping_sets,
    "q34_approx_distinct": q34_approx_distinct,
    "q38_shipping_priority": q38_shipping_priority,
    "q39_local_supplier_volume": q39_local_supplier_volume,
    "q35_json_scan": q35_json_scan,
    "q36_csv_scan": q36_csv_scan,
    "q37_sample": q37_sample,
    "q45_doc_unpivot": q45_doc_unpivot,
    "q96_profile": q96_profile,
    "q98_skew_join": q98_skew_join,
}

ORACLE = {
    "q98_skew_join": SQL98,
    "q01_pricing_summary": SQL01,
    "q65_percentiles": SQL65,
    "q96_profile": SQL96,
    "q02_filter_project": SQL02,
    "q03_revenue_by_nation": SQL03,
    "q04_order_priority": SQL04,
    "q05_customers_without_orders": SQL05,
    "q06_parts_with_bulk_orders": SQL06,
    "q07_ship_latency": SQL07,
    "q08_region_status_grid": SQL08,
    "q09_distinct_users": SQL09,
    "q10_group_families": SQL10F,
    "q15_setops": SQL15S,
    "q35_semi_scan": SQL35S,
    "q10_rollup_orders": SQL10,
    "q11_cube_events": SQL11,
    "q12_top_orders_per_cust": SQL12,
    "q13_running_total": SQL13,
    "q14_topk_orders": SQL14,
    "q15_union_nations": SQL15,
    "q16_except_negative": SQL16,
    "q17_vector_stats": SQL17,
    "q18_doc_pivot": SQL18,
    "q19_first_event": SQL19,
    "q20_json_props": SQL20,
    "q21_event_windows": SQL21,
    "q22_sessionize": SQL22,
    "q23_doc_strings": SQL23,
    "q24_hash_md5": SQL24,
    "q25_asof_orders": SQL25,
    "q26_bucketed_antijoin": SQL26,
    "q27_intersect_nations": SQL27,
    "q28_string_funcs": SQL28,
    "q29_date_funcs": SQL29,
    "q30_array_funcs": SQL30,
    "q31_map_funcs": SQL31,
    "q32_conditionals": SQL32,
    "q33_grouping_sets": SQL33,
    "q38_shipping_priority": SQL38,
    "q39_local_supplier_volume": SQL39,
    "q35_json_scan": SQL35,
    "q36_csv_scan": SQL36,
    "q45_doc_unpivot": SQL45,
}
