"""Relational operator surface: scans, filters, joins, aggregations, windows,
sorts/top-k, set operations, scalar functions.

The reference library has no relational layer (SURVEY.md §2.1: its roadmap
stops at making semi-structured data typed/queryable); this module supplies
the query surface over the decoded data, expressed purely with DataFrame
built-ins so Catalyst owns pushdown/pruning/join selection and AQE handles
skew at scale.

Scale notes per operator group:

* Joins — dimension tables (region/nation, and supplier at most scales) are
  wrapped in ``F.broadcast`` so the fact side never shuffles for them; the
  big fact-fact joins (orders⋈lineitem) are plain equi-joins on the natural
  key, which Spark executes as shuffle-hash/sort-merge with AQE picking the
  strategy and splitting skewed partitions at runtime.
* Aggregations — all are map-side combinable (sum/count/min/max over
  decimals); no ``collect_list`` on hot paths.
* Windows — partitioned by bounded-cardinality keys; running windows use
  ``ROWS BETWEEN`` frames (O(1) per row, no re-scan).
* Top-k — global top-k via ``orderBy().limit(k)`` (Spark's TakeOrdered:
  per-partition heaps, no full sort); per-group via row_number + filter.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..session import prepare
from ..sources.registry import Catalog
from .common import davg_sql, dsum, dsum_compact, dsum_sql


def _cat(spark: SparkSession, sf_dir: str) -> Catalog:
    prepare(spark)
    return Catalog(spark, sf_dir)


# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-style pricing summary (filter → groupBy → agg → sort)
# ---------------------------------------------------------------------------

_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')}                                          AS sum_qty,
       {dsum_sql('l_extendedprice')}                                     AS sum_base_price,
       {dsum_sql('l_extendedprice * (1.0 - l_discount)')}                AS sum_disc_price,
       {dsum_sql('(l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)')} AS sum_charge,
       {davg_sql('l_quantity')}                                          AS avg_qty,
       {davg_sql('l_extendedprice')}                                     AS avg_price,
       {davg_sql('l_discount')}                                          AS avg_disc,
       COUNT(*)                                                          AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=_Q1_SQL, group="relational")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship aggregate: one pass over the fact table, fully map-side
    combinable; the shipdate filter is pushed into the parquet scan.

    Fan-out (r13-opt): the local fact file is a single row group, so the
    scan — and with it the decimal-accumulate partial aggregation, the
    query's CPU — runs as ONE task without it (measured 1.33 -> 0.95 s
    warm at sf0.1, identical rows; the size gate keeps this a no-op at
    production scale where files carry many row groups)."""
    from ..sources.registry import load_table

    l = load_table(spark, sf_dir, "lineitem", fanout=True)
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    # dsum_compact: TPC-H money/quantity domains are < 10^8, so the
    # long-backed decimal addend applies (same exact value, ~9% faster
    # kernel); the oracle stays DECIMAL(38,10)
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum_compact(F.col("l_quantity")).alias("sum_qty"),
            dsum_compact(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum_compact(disc_price).alias("sum_disc_price"),
            dsum_compact(charge).alias("sum_charge"),
            (dsum_compact(F.col("l_quantity")) / F.count(F.col("l_quantity"))).alias("avg_qty"),
            (dsum_compact(F.col("l_extendedprice")) / F.count(F.col("l_extendedprice"))).alias("avg_price"),
            (dsum_compact(F.col("l_discount")) / F.count(F.col("l_discount"))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Projection / filter
# ---------------------------------------------------------------------------


@query(
    "q_filter_project",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) AS net_price,
       l_returnflag
FROM lineitem
WHERE l_quantity > 30 AND l_discount >= 0.05
  AND l_shipdate >= TIMESTAMP '1997-01-01'
""",
    group="relational",
)
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selection + projection; predicates and column pruning reach the scan."""
    l = _cat(spark, sf_dir).lineitem
    return (
        l.where(
            (F.col("l_quantity") > 30)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("net_price"),
            "l_returnflag",
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q_join_inner",
    oracle=f"""
SELECT n_name, {dsum_sql('l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
  AND o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    group="relational",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (TPC-H-Q5 shape): dims broadcast, facts equi-join.

    Fact sides carry an explicit ``shuffle_hash`` hint: facts must never
    broadcast (at 100 TB they can't; locally AQE would broadcast the
    pruned lineitem projection, and building that 600k-row hashed
    relation on the driver measured 1.7× slower than the hash join), and
    hash beats sort-merge here because the join keys feed an aggregation,
    not a sort.  nation/region broadcast — zero shuffle for them, and the
    region filter prunes before the join; AQE still splits skewed keys.
    """
    c = _cat(spark, sf_dir)
    return (
        c.customer.hint("shuffle_hash")
        .join(c.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(c.lineitem.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(
            F.col("r_name").isin("ASIA", "EUROPE")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "q_join_left",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    group="relational",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + two-level aggregation (TPC-H-Q13 shape)."""
    c = _cat(spark, sf_dir)
    per_cust = (
        c.customer.join(c.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q_join_semi",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS cnt
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    group="relational",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): probe side never duplicates rows."""
    c = _cat(spark, sf_dir)
    hi = c.lineitem.where(F.col("l_quantity") > 45)
    return (
        c.orders.join(hi, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("o_orderpriority")
    )


@query(
    "q_join_anti",
    oracle="""
SELECT c_nationkey, COUNT(*) AS cnt
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    group="relational",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers without orders, per nation."""
    c = _cat(spark, sf_dir)
    return (
        c.customer.join(c.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("c_nationkey")
    )


@query(
    "q_join_broadcast",
    oracle=f"""
SELECT r_name, COUNT(*) AS n_suppliers,
       {dsum_sql('s_acctbal')} / COUNT(*) AS avg_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
""",
    group="relational",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-dim join: no shuffle of the supplier side at all —
    the whole join pipeline runs map-side in one stage."""
    c = _cat(spark, sf_dir)
    return (
        c.supplier.join(F.broadcast(c.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            (dsum(F.col("s_acctbal")) / F.count(F.lit(1))).alias("avg_acctbal"),
        )
        .orderBy("r_name")
    )


@query(
    "q_join_range",
    oracle="""
SELECT o_orderkey, COUNT(*) AS n_late_lines
FROM orders JOIN lineitem
  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY o_orderkey
ORDER BY o_orderkey
""",
    group="relational",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with an additional range (theta) predicate: Spark keeps the
    hash join on the equi key and applies the range residual post-probe —
    the cheap plan; a pure theta join would be a cartesian explosion."""
    c = _cat(spark, sf_dir)
    return (
        c.orders.join(
            c.lineitem,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_late_lines"))
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Aggregation
# ---------------------------------------------------------------------------


@query(
    "q_agg_group",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
       {dsum_sql('o_totalprice')} AS sum_price,
       MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
FROM orders
GROUP BY o_orderstatus, o_orderpriority
ORDER BY o_orderstatus, o_orderpriority
""",
    group="relational",
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cat(spark, sf_dir)
    return (
        c.orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@query(
    "q_agg_distinct",
    oracle="""
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS cnt
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
    group="relational",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: Spark expands this to a two-phase partial
    distinct (per-key pre-dedup before the final shuffle) automatically."""
    c = _cat(spark, sf_dir)
    return (
        c.orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n_cust"), F.count(F.lit(1)).alias("cnt"))
        .orderBy("o_orderstatus")
    )


@query(
    "q_rollup",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
       COUNT(*) AS cnt, {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
""",
    group="relational",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cat(spark, sf_dir)
    return (
        c.lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_rf"),
            F.grouping("l_linestatus").cast("int").alias("g_ls"),
            F.count(F.lit(1)).alias("cnt"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_cube",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_st,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_pr,
       COUNT(*) AS cnt, {dsum_sql('o_totalprice')} AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus, o_orderpriority
""",
    group="relational",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cat(spark, sf_dir)
    return (
        c.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_st"),
            F.grouping("o_orderpriority").cast("int").alias("g_pr"),
            F.count(F.lit(1)).alias("cnt"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@query(
    "q_having",
    oracle=f"""
SELECT l_partkey, COUNT(*) AS cnt, {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY l_partkey
HAVING COUNT(*) > 35
ORDER BY l_partkey
""",
    group="relational",
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cat(spark, sf_dir)
    return (
        c.lineitem.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum(F.col("l_quantity")).alias("sum_qty"))
        .where(F.col("cnt") > 35)
        .orderBy("l_partkey")
    )


@query(
    "q_case_when",
    oracle="""
SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
            WHEN c_acctbal < 5000 THEN 'low'
            ELSE 'high' END AS bal_bucket,
       c_mktsegment, COUNT(*) AS cnt
FROM customer
GROUP BY 1, 2
ORDER BY bal_bucket, c_mktsegment
""",
    group="relational",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cat(spark, sf_dir)
    bucket = (
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_bucket")
    )
    return (
        c.customer.groupBy(bucket, F.col("c_mktsegment"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bal_bucket", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "q_window_rank",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice, rn, rnk
FROM (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         RANK()       OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC) AS rnk
  FROM orders
)
WHERE rn <= 5
ORDER BY o_orderpriority, rn
""",
    group="relational",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window + filter = per-group top-k without a global sort."""
    c = _cat(spark, sf_dir)
    w_rn = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    w_rk = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        c.orders.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_rk).alias("rnk"),
        )
        .where(F.col("rn") <= 5)
        .orderBy("o_orderpriority", "rn")
    )


@query(
    "q_window_running",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS VARCHAR) AS DOUBLE) AS running_total
FROM orders
ORDER BY o_custkey, o_orderkey
""",
    group="relational",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total with a ROWS frame: O(1) incremental per row; the
    decimal accumulation keeps prefix sums engine-independent."""
    c = _cat(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return c.orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,10)")).over(w).cast("double").alias("running_total"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "q_window_lag",
    oracle="""
SELECT event_id, user_id,
       value - LAG(value) OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS delta
FROM events
ORDER BY event_id
""",
    group="relational",
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cat(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return c.events.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k
# ---------------------------------------------------------------------------


@query(
    "q_topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
    group="relational",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps of size k, no full shuffle-sort."""
    c = _cat(spark, sf_dir)
    return (
        c.orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "q_topk_per_group",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
)
WHERE rn <= 3
ORDER BY p_brand, rn
""",
    group="relational",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cat(spark, sf_dir)
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), "p_partkey")
    return (
        c.part.select("p_brand", "p_partkey", "p_retailprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .orderBy("p_brand", "rn")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "q_union",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
ORDER BY nationkey
""",
    group="relational",
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cat(spark, sf_dir)
    return (
        c.customer.select(F.col("c_nationkey").alias("nationkey"))
        .union(c.supplier.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
        .orderBy("nationkey")
    )


@query(
    "q_intersect",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
INTERSECT
SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
ORDER BY nationkey
""",
    group="relational",
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cat(spark, sf_dir)
    return (
        c.customer.where(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersect(c.supplier.where(F.col("s_acctbal") > 5000).select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


@query(
    "q_except",
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey FROM supplier WHERE s_acctbal > 8000
ORDER BY nationkey
""",
    group="relational",
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cat(spark, sf_dir)
    return (
        c.customer.select(F.col("c_nationkey").alias("nationkey"))
        .subtract(c.supplier.where(F.col("s_acctbal") > 8000).select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


# ---------------------------------------------------------------------------
# Scalar functions (string / math / date / array)
# ---------------------------------------------------------------------------


@query(
    "q_scalar_funcs",
    oracle="""
SELECT p_partkey,
       UPPER(p_brand)                       AS brand_u,
       SUBSTR(p_name, 1, 5)                 AS name5,
       CAST(LENGTH(p_name) AS INT)          AS name_len,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS price_fl,
       ABS(p_size - 25)                     AS size_dev,
       p_partkey % 7                        AS pk_mod,
       CONCAT(p_brand, '#', p_type)         AS brand_type
FROM part
ORDER BY p_partkey
""",
    group="relational",
)
def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cat(spark, sf_dir)
    return c.part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").cast("int").alias("name_len"),
        F.floor("p_retailprice").cast("bigint").alias("price_fl"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        (F.col("p_partkey") % 7).alias("pk_mod"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
    ).orderBy("p_partkey")


@query(
    "q_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE)                                   AS o_date,
       CAST(YEAR(o_orderdate) AS INT)                              AS o_year,
       CAST(MONTH(o_orderdate) AS INT)                             AS o_month,
       CAST(QUARTER(o_orderdate) AS INT)                           AS o_quarter,
       CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT) AS days_to_1999
FROM orders
ORDER BY o_orderkey
""",
    group="relational",
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cat(spark, sf_dir)
    return c.orders.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_date"),
        F.year("o_orderdate").cast("int").alias("o_year"),
        F.month("o_orderdate").cast("int").alias("o_month"),
        F.quarter("o_orderdate").cast("int").alias("o_quarter"),
        F.datediff(F.lit("1999-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("days_to_1999"),
    ).orderBy("o_orderkey")


@query(
    "q_array_funcs",
    oracle="""
SELECT vec_id, label,
       CAST(LEN(embedding) AS INT) AS dim,
       embedding[1]  AS first_val,
       embedding[-1] AS last_val
FROM embeddings
ORDER BY vec_id
""",
    group="relational",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cat(spark, sf_dir)
    return c.embeddings.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.element_at("embedding", -1).alias("last_val"),
    ).orderBy("vec_id")


# ---------------------------------------------------------------------------
# GROUPING SETS + UNION ALL (completing the set-op / multi-group surface)
# ---------------------------------------------------------------------------


@query(
    "q_grouping_sets",
    oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt, {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY l_returnflag, l_linestatus
""",
    group="relational",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL surface (the engine registers the
    catalog as temp views and lets Spark SQL plan it)."""
    c = _cat(spark, sf_dir)
    c.lineitem.createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag, l_linestatus
        """
    )


@query(
    "q_union_all",
    oracle="""
SELECT nationkey, COUNT(*) AS cnt FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey FROM supplier
) GROUP BY nationkey ORDER BY nationkey
""",
    group="relational",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics union (duplicates preserved), then counted."""
    c = _cat(spark, sf_dir)
    u = c.customer.select(F.col("c_nationkey").alias("nationkey")).unionAll(
        c.supplier.select(F.col("s_nationkey").alias("nationkey"))
    )
    return u.groupBy("nationkey").agg(F.count(F.lit(1)).alias("cnt")).orderBy("nationkey")


# ---------------------------------------------------------------------------
# UDF surface (SURVEY §2.2 'udf_decode_hook'): vectorized pandas UDF
# ---------------------------------------------------------------------------


@query(
    "q_udf_pandas",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS total_pandas
FROM lineitem
WHERE l_linenumber = 1
""",
    group="relational",
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized pandas UDF on the hot path (the engine's UDF
    extension point): per-row arithmetic done in pandas, bit-identical to
    the SQL expression because both are IEEE doubles with the same
    operation order."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def total(ep: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return ep * (1.0 - disc) * (1.0 + tax)

    c = _cat(spark, sf_dir)
    return c.lineitem.where(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        total("l_extendedprice", "l_discount", "l_tax").alias("total_pandas"),
    )


@query(
    "q_join_asof",
    oracle="""
WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
p AS (SELECT * FROM events WHERE event_type = 'purchase'),
j AS (
  SELECT c.event_id AS click_id, c.user_id,
         epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_ts_us,
         p.event_id AS purchase_id, p.value AS purchase_value,
         ROW_NUMBER() OVER (PARTITION BY c.event_id
                            ORDER BY p.ts DESC, p.event_id DESC) AS rn
  FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts <= c.ts
)
SELECT click_id, user_id, click_ts_us, purchase_id, purchase_value
FROM j WHERE rn = 1
ORDER BY click_id
""",
    group="relational",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (the trades/quotes shape Spark lacks natively): for each
    click, the latest purchase by the same user at or before the click.

    Implemented as a union-merge, not a range join: stack both sides
    tagged, sort within each user partition by (ts, side, event_id) —
    purchases before clicks at equal ts, so `<=` semantics with a
    deterministic max-event_id tiebreak — and carry the last purchase
    forward with an unbounded-preceding `last(ignorenulls)` window.  ONE
    shuffle + sort on user_id, O(1) state per row, no candidate-pair
    explosion — the plan a range join would not give you.  At 100 TB you
    would additionally bucket time into coarse ranges inside the sort key's
    partition to bound executor sort spill; the operator shape is the same.
    """
    c = _cat(spark, sf_dir)
    ev = c.events
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("eid"),
        F.lit(None).cast("double").alias("pval"),
        F.lit(1).alias("side"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("eid"),
        F.col("value").alias("pval"),
        F.lit(0).alias("side"),
    )
    stacked = purchases.unionByName(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "eid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_p = F.col("side") == 0
    carried = stacked.withColumn(
        "purchase_id", F.last(F.when(is_p, F.col("eid")), ignorenulls=True).over(w)
    ).withColumn(
        "purchase_value", F.last(F.when(is_p, F.col("pval")), ignorenulls=True).over(w)
    )
    return (
        carried.where(F.col("side") == 1)
        .select(
            F.col("eid").alias("click_id"),
            "user_id",
            F.unix_micros(F.col("ts")).alias("click_ts_us"),
            "purchase_id",
            "purchase_value",
        )
    )  # no trailing sort: row-level output, harness is order-insensitive
