"""Table profiling: per-column statistics in one declarative pass each.

The ``ANALYZE TABLE``-shaped operator every pipeline runs before trusting
a new dataset: row count, null count, exact distinct count, min/max per
column, emitted long-format (one row per column) so downstream rules can
join against it.

Scale shape: each column's profile is its own aggregate over a scan that
reads ONLY that column (Parquet column pruning — verified in the plan:
single-column ReadSchema per branch), all map-side combinable, unioned at
metadata scale (#columns rows).  At 100 TB swap ``countDistinct`` for
``approx_count_distinct``/HLL sketches (see q_sketch_rollup) — the shape
is unchanged; exact NDV is kept here for the cross-engine oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import prepare
from ..sources.registry import load_table

#: numeric lineitem columns profiled by the registered query
PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def profile(df: DataFrame, columns) -> DataFrame:
    """Long-format numeric profile: one aggregate per column over a
    column-pruned scan, unioned."""
    parts = []
    for c in columns:
        parts.append(
            df.select(F.col(c).cast("double").alias("v")).agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.count(F.lit(1)) - F.count("v")).alias("n_null"),
                F.countDistinct("v").alias("n_distinct"),
                F.min("v").alias("min_v"),
                F.max("v").alias("max_v"),
            )
        )
    return reduce(DataFrame.unionAll, parts).orderBy("column")


@query(
    "q_profile_stats",
    oracle="""
SELECT * FROM (
  SELECT 'l_discount' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(*) - COUNT(l_discount) AS BIGINT) AS n_null,
         CAST(COUNT(DISTINCT CAST(l_discount AS DOUBLE)) AS BIGINT) AS n_distinct,
         MIN(CAST(l_discount AS DOUBLE)) AS min_v, MAX(CAST(l_discount AS DOUBLE)) AS max_v
  FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', COUNT(*), COUNT(*) - COUNT(l_extendedprice),
         COUNT(DISTINCT CAST(l_extendedprice AS DOUBLE)),
         MIN(CAST(l_extendedprice AS DOUBLE)), MAX(CAST(l_extendedprice AS DOUBLE))
  FROM lineitem
  UNION ALL
  SELECT 'l_quantity', COUNT(*), COUNT(*) - COUNT(l_quantity),
         COUNT(DISTINCT CAST(l_quantity AS DOUBLE)),
         MIN(CAST(l_quantity AS DOUBLE)), MAX(CAST(l_quantity AS DOUBLE))
  FROM lineitem
  UNION ALL
  SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
         COUNT(DISTINCT CAST(l_tax AS DOUBLE)),
         MIN(CAST(l_tax AS DOUBLE)), MAX(CAST(l_tax AS DOUBLE))
  FROM lineitem
) ORDER BY "column"
""",
    group="relational",
)
def q_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric profile of the fact table (count / nulls / exact NDV /
    min / max per column, long format)."""
    prepare(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return profile(li, PROFILE_COLS)
