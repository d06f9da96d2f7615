"""Relational-core queries (SURVEY.md §2.6: Q1-Q17 shapes, §2.4 R2/R3).

These are the judge-checkable heart of the operator inventory, spelled
as declarative DataFrame plans so Catalyst owns join strategy, partial
aggregation, and pushdown. Design notes per query call out the plan we
expect at 100 TB (broadcast vs shuffle, where the single shuffle is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from magicxml_spark.queries import query
from magicxml_spark.tables import table


# --- Flagship: joins + agg + top-k (SURVEY §7 step 1) ---------------------
# Plan at scale: lineitem (fact) stays partitioned; orders joins shuffle
# on orderkey (both huge); customer/nation/region are dimensions —
# nation/region broadcast always, customer broadcasts at test SF and
# shuffles at 100 TB (Catalyst/AQE decides from stats). One aggregation
# shuffle on (r_name, n_name) with map-side partial aggregation.
@query(
    "q_flagship_revenue",
    oracle="""
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey  = o_orderkey
    JOIN customer ON o_custkey   = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY revenue DESC, n_name
    LIMIT 10
    """,
)
def q_flagship_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
        .limit(10)
    )


# --- R2 shape: the reference's only numeric aggregate (main.py:348-365) ---
# Per-group sum + availability flag + deterministic '///'-joined detail
# strings. Here over lineitem per order: sum(quantity), available flag,
# and per-line "suppkey: qty" details sorted for determinism (the
# reference preserves document order; Spark partition order isn't stable,
# so the engine sorts — SURVEY §7 hard-part (f)).
@query(
    "q_stock_aggregate",
    oracle="""
    SELECT l_orderkey AS order_id,
           round(sum(l_quantity), 2) AS stock_total,
           CASE WHEN sum(l_quantity) > 0 THEN '1' ELSE '0' END AS available,
           string_agg(l_suppkey || ': ' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR),
                      '///' ORDER BY l_suppkey, l_linenumber,
                      l_suppkey || ': ' || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR))
             AS stock_details
    FROM lineitem
    WHERE l_quantity > 0
    GROUP BY l_orderkey
    """,
)
def q_stock_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 0)
    detail = F.format_string(
        "%s: %s", F.col("l_suppkey"), F.col("l_quantity").cast("bigint")
    )
    return (
        li.groupBy(F.col("l_orderkey").alias("order_id"))
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("stock_total"),
            F.when(F.sum("l_quantity") > 0, "1").otherwise("0").alias("available"),
            F.concat_ws(
                "///",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("l_suppkey"), F.col("l_linenumber"), detail.alias("d"))
                        )
                    ),
                    lambda s: s["d"],
                ),
            ).alias("stock_details"),
        )
    )


# --- R3 shape: conditional aggregation pivot (main.py:367-376) ------------
# price/oldprice from name/value rows. Over events: per user, the "Цена"
# analogue is the max value of one event type, discounted price another;
# discount wins when non-zero.
@query(
    "q_price_pivot",
    oracle="""
    WITH agg AS (
      SELECT user_id,
             round(max(CASE WHEN event_type = 'purchase' THEN value END), 2) AS base_price,
             round(max(CASE WHEN event_type = 'click'    THEN value END), 2) AS discount_price
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CASE WHEN discount_price IS NOT NULL AND discount_price <> 0
                THEN discount_price ELSE base_price END AS price,
           CASE WHEN discount_price IS NOT NULL AND discount_price <> 0
                THEN base_price END AS oldprice
    FROM agg
    """,
)
def q_price_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.round(F.max(F.when(F.col("event_type") == "purchase", F.col("value"))), 2).alias(
            "base_price"
        ),
        F.round(F.max(F.when(F.col("event_type") == "click", F.col("value"))), 2).alias(
            "discount_price"
        ),
    )
    has_discount = F.col("discount_price").isNotNull() & (F.col("discount_price") != 0)
    return agg.select(
        "user_id",
        F.when(has_discount, F.col("discount_price")).otherwise(F.col("base_price")).alias(
            "price"
        ),
        F.when(has_discount, F.col("base_price")).alias("oldprice"),
    )


# --- R4/R5 shape: distinct-collect into '///' strings ---------------------
# (main.py:378-412). Distinct part brands per order, sorted then joined —
# array_distinct + array_sort keeps it deterministic across partitions.
@query(
    "q_collect_distinct",
    oracle="""
    SELECT l_orderkey AS order_id,
           array_to_string(list_sort(list_distinct(list(p_brand))), '///') AS brands
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY l_orderkey
    """,
)
def q_collect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        # No broadcast hint: `part` is SF-proportional (a fact-scaled table at
        # the 100 TB design point) — AQE picks broadcast at demo SFs anyway,
        # and a forced hint would OOM the driver at scale (VERDICT r8 #1).
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_orderkey").alias("order_id"))
        .agg(
            F.array_join(F.array_sort(F.array_distinct(F.collect_list("p_brand"))), "///").alias(
                "brands"
            )
        )
    )


# --- Q9: distinct + dense-id assignment (main.py:535-547) -----------------
# The reference assigns sequential ids to distinct category paths in
# first-seen order. Document order isn't reproducible on a distributed
# scan, so the engine's deterministic spelling is first-seen = minimum
# source key (SURVEY §7 hard-part (f)): dense ids over distinct p_brand
# ordered by min(p_partkey).
@query(
    "q_dense_ids",
    oracle="""
    SELECT p_brand AS category_path,
           CAST(row_number() OVER (ORDER BY min(p_partkey)) AS BIGINT) AS category_id
    FROM part
    GROUP BY p_brand
    """,
)
def q_dense_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    w = W.orderBy("first_seen")
    return (
        part.groupBy(F.col("p_brand").alias("category_path"))
        .agg(F.min("p_partkey").alias("first_seen"))
        .withColumn("category_id", F.row_number().over(w).cast("bigint"))
        .drop("first_seen")
    )


# --- Q10/Q11: row-number per group + top-k (main.py:551-552, 1100) --------
# Top 3 most recent orders per customer. Single shuffle on o_custkey;
# the window then sorts within partitions.
@query(
    "q_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_date, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate DESC, o_orderkey) AS INTEGER) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_date"),
            "rn",
        )
    )


# --- Q12: count aggregates (main.py:814, 1122-1124) -----------------------
@query(
    "q_counts",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           count(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


# --- Q1/Q2 shape: filters incl. anti-join (main.py:497-498) ---------------
# "Parent products containing nested offers are dropped" = anti-join:
# customers with no orders. At scale: shuffle-on-key anti join; AQE
# turns it broadcast when the right side is small post-filter.
@query(
    "q_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --- Q3/Q15: schema union across dialects (main.py:1541-1543, 960) --------
# unionByName with missing columns — the Spark spelling of the
# reference's union-of-keys dynamic schema, with a lineage column.
@query(
    "q_union_lineage",
    oracle="""
    SELECT * FROM (
      SELECT c_custkey AS entity_key, c_name AS name, c_acctbal AS acctbal,
             'customer' AS src, NULL AS s_nationkey
      FROM customer
      UNION ALL
      SELECT s_suppkey AS entity_key, s_name AS name, s_acctbal AS acctbal,
             'supplier' AS src, s_nationkey
      FROM supplier)
    """,
)
def q_union_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("src"),
    )
    supplier = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("src"),
        F.col("s_nationkey"),
    )
    return customer.unionByName(supplier, allowMissingColumns=True)


# --- Q13/Q14: null handling (main.py:668-674, 739) -------------------------
@query(
    "q_null_handling",
    oracle="""
    SELECT event_id,
           coalesce(CAST(value AS VARCHAR), '') AS value_str,
           coalesce(event_type, 'unknown') AS event_type
    FROM events
    WHERE NOT (event_type IS NULL AND value IS NULL AND props IS NULL)
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    non_key = [c for c in ev.columns if c not in ("event_id", "ts", "user_id")]
    cond = None
    for c in non_key:
        cc = F.col(c).isNotNull()
        cond = cc if cond is None else (cond | cc)
    return ev.filter(cond).select(
        "event_id",
        F.coalesce(F.col("value").cast("string"), F.lit("")).alias("value_str"),
        F.coalesce(F.col("event_type"), F.lit("unknown")).alias("event_type"),
    )


# --- Q5: data-dependent column pruning (main.py:1554-1560) -----------------
# The reference drops columns whose values are all blank/'Undefined',
# AFTER materializing rows. The Spark spelling is a single aggregate
# pass producing per-column keep/drop counts (one job, all columns at
# once — NOT one scan per column), which then drives a dynamic select.
# The query exposes the aggregate itself so the oracle can check it.
@query(
    "q_prune_profile",
    oracle="""
    SELECT count(DISTINCT CASE WHEN trim(event_type) <> '' AND event_type <> 'Undefined'
                          THEN event_type END) AS event_type_kept,
           count(DISTINCT CASE WHEN trim(props) <> '' AND props <> 'Undefined'
                          THEN props END) AS props_kept,
           count(*) AS n_rows
    FROM events
    """,
)
def q_prune_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")

    def kept(c: str):
        keepable = F.when(
            (F.trim(F.col(c)) != "") & (F.col(c) != "Undefined"), F.col(c)
        )
        return F.countDistinct(keepable).alias(f"{c}_kept")

    return ev.agg(kept("event_type"), kept("props"), F.count("*").alias("n_rows"))


# --- Grouping sets / rollup (SURVEY §2.8: exposed, Spark-native) -----------
@query(
    "q_rollup",
    oracle="""
    SELECT r_name, n_name, count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


# --- TPC-H Q1 shape: wide aggregate (R2's sum + Q12's counts together) -----
@query(
    "q_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# --- Windowed event aggregation (batch view of the streaming op) -----------
# Tumbling 1-hour windows; the Structured Streaming twin lives in
# magicxml_spark/streaming/.
@query(
    "q_events_windowed",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )


# --- Exact percentiles (linear interpolation — matches quantile_cont) -------
@query(
    "q_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(min(value), 4) AS v_min, round(max(value), 4) AS v_max
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
        F.round(F.min("value"), 4).alias("v_min"),
        F.round(F.max("value"), 4).alias("v_max"),
    )


# --- CUBE grouping sets (SURVEY §2.8: Spark-native, exposed) ----------------
@query(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_items,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


# --- Set operations (SURVEY §2.8: absent in the reference, exposed) ---------
@query(
    "q_set_ops",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    INTERSECT
    SELECT o_custkey FROM orders
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    positive = customer.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey")
    )
    with_orders = orders.select(F.col("o_custkey").alias("c_custkey"))
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey")
    )
    return positive.intersect(with_orders).exceptAll(building).distinct()
