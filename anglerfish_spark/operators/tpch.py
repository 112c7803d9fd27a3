"""TPC-H query shapes over the synthetic star schema (the subset whose
columns exist in the trimmed testdata — there is no partsupp table and no
phone/comment/shipmode columns, so Q2/Q9/Q11/Q12/Q16/Q20/Q21 are out of
reach and Q22 is re-keyed to mktsegment).

Together with Q1/Q3/Q4/Q5/Q13 in relational*.py this gives the engine a
recognizable OLAP benchmark inventory.  The reference has no relational
layer (SURVEY.md §2.1) — this is the query surface over decoded data.

Scale notes, applied throughout:

* part/supplier/nation are broadcast (dims); fact-fact joins
  (orders⋈lineitem, per-key agg join-backs) stay shuffle-hash — fact sides
  must never broadcast at 100 TB, and the join keys feed aggregations, not
  sorts (see q_join_inner's measured rationale).
* Every double sum uses the decimal contract (common.dsum) so results are
  partition-order independent.
* Top-k outputs always carry a unique tiebreak column in the ORDER BY so
  LIMIT is deterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import prepare
from ..sources.registry import Catalog
from .common import dsum, dsum_sql

_REVENUE = "l_extendedprice * (1.0 - l_discount)"


def _cat(spark: SparkSession, sf_dir: str) -> Catalog:
    prepare(spark)
    return Catalog(spark, sf_dir)


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


@query(
    "q_forecast_revenue",
    oracle=f"""
SELECT {dsum_sql("l_extendedprice * l_discount")} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    group="tpch",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): fully-pushed-down scan
    predicate plus one combinable global sum — the cheapest possible shape;
    the scan reads three columns and the filter prunes at the parquet
    level."""
    li = _cat(spark, sf_dir).lineitem
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


@query(
    "q_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       {dsum_sql(_REVENUE)} AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    group="tpch",
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two trading nations): both nation
    dims broadcast under different aliases; the nation-pair disjunction
    filters *after* the broadcasts, so the fact tables shuffle only on
    their join keys.  supplier broadcasts too (smallest table)."""
    c = _cat(spark, sf_dir)
    n1 = c.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = c.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        c.lineitem.hint("shuffle_hash")
        .join(F.broadcast(c.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c.orders.hint("shuffle_hash"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c.customer.hint("shuffle_hash"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            pair
            & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year")
        )
        .agg(dsum(_revenue()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q_market_share",
    oracle=f"""
WITH all_vol AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1.0 - l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
SELECT o_year,
       {dsum_sql("CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0.0 END")}
         / {dsum_sql("volume")} AS mkt_share
FROM all_vol
GROUP BY o_year
ORDER BY o_year
""",
    group="tpch",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of regional
    volume for a part type, by year.  The share is a ratio of two decimal
    sums over the *same* joined relation — one pass, conditional numerator;
    part/supplier/nation/region all broadcast, facts shuffle once each."""
    c = _cat(spark, sf_dir)
    n1 = c.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = c.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    vol = (
        c.lineitem.hint("shuffle_hash")
        .join(F.broadcast(c.part.where(F.col("p_type") == "ECONOMY")),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(c.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c.orders.hint("shuffle_hash"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c.customer.hint("shuffle_hash"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(c.region), F.col("n2_region") == F.col("r_regionkey"))
        .where(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
        )
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _revenue().alias("volume"),
            "supp_nation",
        )
    )
    national = F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(F.lit(0.0))
    return (
        vol.groupBy("o_year")
        .agg((dsum(national) / dsum(F.col("volume"))).alias("mkt_share"))
        .orderBy("o_year")
    )


@query(
    "q_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, {dsum_sql(_REVENUE)} AS revenue, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    group="tpch",
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top 20 customers by lost
    revenue in a quarter-pair.  Facts shuffle-hash on their keys; the
    top-k is orderBy+limit (per-partition heaps, no global sort);
    c_custkey tiebreaks revenue ties so LIMIT is deterministic."""
    c = _cat(spark, sf_dir)
    return (
        c.customer.hint("shuffle_hash")
        .join(c.orders.hint("shuffle_hash"), F.col("c_custkey") == F.col("o_custkey"))
        .join(c.lineitem.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .where(
            (F.col("l_returnflag") == "R")
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_revenue()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q_promo_revenue",
    oracle=f"""
SELECT 100.0 * {dsum_sql(
        "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END"
    )} / {dsum_sql(_REVENUE)} AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
""",
    group="tpch",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percentage of a month's revenue from
    promo parts — conditional/total sum ratio in one aggregation over a
    broadcast part join; the month filter prunes the fact scan."""
    c = _cat(spark, sf_dir)
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0.0))
    return (
        c.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(F.broadcast(c.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg((F.lit(100.0) * dsum(promo) / dsum(_revenue())).alias("promo_revenue"))
    )


@query(
    "q_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {dsum_sql(_REVENUE)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    group="tpch",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): per-supplier quarterly revenue, keep the
    max.  The revenue relation is used twice (rows + global max) — the max
    is a 1-row broadcast cross-join back onto it, not a re-aggregation;
    revenue values come from the same decimal sums on both engines so the
    equality predicate is exact."""
    c = _cat(spark, sf_dir)
    revenue = (
        c.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(_revenue()).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(_cat(spark, sf_dir).supplier),
              F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q_small_qty_revenue",
    oracle=f"""
SELECT {dsum_sql("l_extendedprice")} / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS a_partkey,
         0.5 * ({dsum_sql("l_quantity")} / COUNT(*)) AS qty_limit
  FROM lineitem GROUP BY l_partkey
) ON a_partkey = l_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < qty_limit
""",
    group="tpch",
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines below half their
    part's average quantity.  The correlated subquery decorrelates into a
    per-part aggregate joined back to the fact — one combinable agg keyed
    by partkey, one shuffle-hash join-back (both sides already partitioned
    by partkey, so AQE reuses the exchange), brand dim broadcast."""
    c = _cat(spark, sf_dir)
    limits = (
        c.lineitem.groupBy(F.col("l_partkey").alias("a_partkey"))
        .agg((F.lit(0.5) * (dsum(F.col("l_quantity")) / F.count(F.lit(1)))).alias("qty_limit"))
    )
    return (
        c.lineitem.hint("shuffle_hash")
        .join(F.broadcast(c.part.where(F.col("p_brand") == "Brand#23")),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(limits.hint("shuffle_hash"), F.col("a_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("qty_limit"))
        .agg((dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "q_large_orders",
    oracle=f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {dsum_sql("l_quantity")} AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE) > 150.0
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
    group="tpch",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds a threshold.  The HAVING subquery is a per-orderkey combinable
    sum → semi-join; the outer aggregation re-groups the surviving lines.
    orderkey tiebreaks equal totalprices for a deterministic LIMIT."""
    c = _cat(spark, sf_dir)
    big = (
        c.lineitem.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("oq"))
        .where(F.col("oq") > 150.0)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        c.customer.hint("shuffle_hash")
        .join(c.orders.hint("shuffle_hash"), F.col("c_custkey") == F.col("o_custkey"))
        .join(c.lineitem.hint("shuffle_hash"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(big.hint("shuffle_hash"), F.col("big_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q_brand_revenue",
    oracle=f"""
SELECT {dsum_sql(_REVENUE)} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""",
    group="tpch",
)
def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): OR-of-conjunctions across both join
    sides.  The part side broadcasts; the disjunction can't push below the
    join (it spans both tables) but Catalyst derives the partial filters
    (brand IN (...), quantity range union) that do push to each scan."""
    c = _cat(spark, sf_dir)

    def clause(brand: str, max_size: int, qlo: float, qhi: float) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= 1) & (F.col("p_size") <= max_size)
            & (F.col("l_quantity") >= qlo) & (F.col("l_quantity") <= qhi)
        )

    return (
        c.lineitem.join(F.broadcast(c.part), F.col("p_partkey") == F.col("l_partkey"))
        .where(
            clause("Brand#12", 5, 1, 11)
            | clause("Brand#23", 10, 10, 20)
            | clause("Brand#3", 15, 20, 30)
        )
        .agg(dsum(_revenue()).alias("revenue"))
    )


@query(
    "q_lost_customers",
    oracle=f"""
WITH cutoff AS (
  SELECT {dsum_sql("c_acctbal")} / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
       {dsum_sql("c_acctbal")} AS totacctbal
FROM customer, cutoff
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    group="tpch",
)
def q_lost_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity), re-keyed to mktsegment
    (the testdata has no phone column): above-average-balance customers
    with no *recent* orders (dormant big spenders).  Scalar-subquery
    average → 1-row broadcast; the NOT EXISTS is an anti join on custkey
    against the date-filtered orders; one combinable rollup."""
    c = _cat(spark, sf_dir)
    cutoff = c.customer.where(F.col("c_acctbal") > 0.0).agg(
        (dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = (
        c.orders.where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.customer.join(F.broadcast(cutoff))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
