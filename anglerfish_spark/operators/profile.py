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


# ---------------------------------------------------------------------------
# z-score outlier detection (data-cleaning rule on exact moments)
# ---------------------------------------------------------------------------

from .common import dsum, dsum_sql  # noqa: E402

Z_CUT = 3.0


@query(
    "q_outlier_zscore",
    oracle=f"""
WITH m AS (
  SELECT event_type, COUNT(*) AS n,
         {dsum_sql('value')} AS sx,
         {dsum_sql('value * value')} AS sxx
  FROM events GROUP BY event_type
),
s AS (
  SELECT event_type, n, sx / n AS mu,
         sqrt(GREATEST((sxx - sx * sx / n) / (n - 1), 0)) AS sigma
  FROM m WHERE n > 1
)
SELECT e.event_type,
       CAST(s.n AS BIGINT) AS n_events,
       CAST(COUNT(CASE WHEN s.sigma > 0
                        AND abs((e.value - s.mu) / s.sigma) > {Z_CUT}
                       THEN 1 END) AS BIGINT) AS n_outliers
FROM events e JOIN s USING (event_type)
GROUP BY e.event_type, s.n
ORDER BY event_type
""",
    group="relational",
)
def q_outlier_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier counts — the standard data-cleaning rule
    (|value − μ| > 3σ within its event type), deterministic because μ/σ
    derive from decimal-exact moment sums and the per-row z expression is
    the identical double tree in both engines (the built-in stddev's
    partition-order dependence would make the >3σ boundary flap).

    Scale shape: one combinable moment pass (group-count rows out), the
    tiny moment table broadcast back onto the corpus, one combinable
    count rollup — the corpus shuffles once, same as q1.
    """
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum(F.col("value")).alias("sx"),
        dsum(F.col("value") * F.col("value")).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    # degenerate-group guards, mirrored in the oracle: n=1 groups have no
    # sample variance (dropped); a tiny negative rounding residual is
    # clamped before sqrt (DuckDB's sqrt ERRORS on negatives); sigma=0
    # (constant column) defines zero outliers — Spark's NaN z would
    # otherwise count every row (NaN > cut is true) while DuckDB's x/0
    # NULL counts none
    stats = m.where(n > 1).select(
        "event_type",
        n,
        (sx / n).alias("mu"),
        F.sqrt(F.greatest((sxx - sx * sx / n) / (n - 1), F.lit(0.0))).alias("sigma"),
    )
    z = F.abs((F.col("value") - F.col("mu")) / F.col("sigma"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", n.cast("bigint").alias("n_events"))
        .agg(
            F.count(F.when((F.col("sigma") > 0) & (z > Z_CUT), 1))
            .cast("bigint")
            .alias("n_outliers")
        )
        .orderBy("event_type")
    )
