"""Change-history operators: SCD2 validity intervals and log compaction.

The warehouse patterns that sit next to the engine's upsert sink
(streaming/sinks.py foreachBatch MERGE, q_upsert): turning an append-only
event log into (a) a slowly-changing-dimension type-2 history — one
validity interval per observed state — and (b) the log-compacted latest
state per key (what a Kafka compacted topic or the MERGE steady state
materializes).

Scale shapes: both are single-shuffle window operators partitioned by the
entity key — at 100 TB the event log is hash-partitioned by ``user_id``
and each partition sorts locally; there is no global sort and no join.
Late-arriving events are a *re-window of the affected keys only* in
incremental runs (the foreachBatch sink's per-key MERGE pairs with the
compaction here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..session import prepare
from ..sources.registry import load_table


@query(
    "q_scd2_history",
    oracle="""
SELECT user_id,
       CAST(ROW_NUMBER() OVER w AS INT) AS version,
       epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
       LEAD(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS valid_to_us,
       event_type AS state
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version
""",
    group="relational",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: each user's event stream
    becomes versioned validity intervals ``[valid_from, valid_to)`` with an
    open (null) end on the current state.  ``(ts, event_id)`` ordering
    makes versions deterministic under timestamp ties.

    One shuffle (hash by user_id), per-partition sort, two window
    functions over the same frame — Catalyst evaluates them in a single
    Window operator.
    """
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return (
        ev.select(
            "user_id",
            F.row_number().over(w).cast("int").alias("version"),
            us.alias("valid_from_us"),
            F.lead(us).over(w).alias("valid_to_us"),
            F.col("event_type").alias("state"),
        )
        .orderBy("user_id", "version")
    )


@query(
    "q_log_compact",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type, ts_us AS latest_ts_us, value AS latest_value
FROM ranked WHERE rn = 1
ORDER BY user_id, event_type
""",
    group="relational",
)
def q_log_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log compaction: the latest event per (user_id, event_type) — the
    batch analogue of a Kafka compacted topic and of what the foreachBatch
    keyed-upsert sink (streaming/sinks.py) converges to.  Deterministic
    under timestamp ties via the event_id tiebreak (``max_by`` would be
    partition-order-dependent on ties).

    One shuffle keyed by the compaction key; the rn=1 filter pushes into
    the Window via Spark's TopK/rank-limit optimization.
    """
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("latest_ts_us"),
            "value",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "latest_ts_us",
            F.col("value").alias("latest_value"),
        )
        .orderBy("user_id", "event_type")
    )


@query(
    "q_retention_cohorts",
    oracle="""
WITH firstday AS (
  SELECT user_id,
         MIN(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)) AS cohort_day
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT) AS active_day
  FROM events
)
SELECT f.cohort_day,
       CAST(a.active_day - f.cohort_day AS BIGINT) AS age_days,
       CAST(COUNT(*) AS BIGINT) AS active_users
FROM activity a JOIN firstday f USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_day, age_days
""",
    group="relational",
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each subsequent active day as (cohort_day, age_days, active_users)
    — the standard product-analytics rollup.

    Shuffles: per-user first-day (combinable min), per-(user, day)
    dedup (combinable), then the user-keyed join and the final rollup.
    Both aggregates and the join key on user_id, so AQE reuses one
    partitioning; no window, no global sort.
    """
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("bigint")
    firstday = ev.select("user_id", day.alias("d")).groupBy("user_id").agg(
        F.min("d").alias("cohort_day")
    )
    activity = ev.select("user_id", day.alias("active_day")).distinct()
    return (
        activity.join(firstday, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("active_day") - F.col("cohort_day")).cast("bigint").alias("age_days"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("active_users"))
        .orderBy("cohort_day", "age_days")
    )


@query(
    "q_cdc_apply",
    oracle="""
WITH log AS (
  SELECT user_id,
         CASE event_type WHEN 'error' THEN 'D' WHEN 'signup' THEN 'I' ELSE 'U' END AS op,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value, event_id
  FROM events
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts_us DESC, event_id DESC) AS rn
  FROM log
),
stats AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_ops,
         CAST(COUNT(*) FILTER (WHERE op = 'D') AS BIGINT) AS n_deletes
  FROM log GROUP BY user_id
)
SELECT r.user_id, r.op AS last_op, r.ts_us AS latest_ts_us,
       r.value AS latest_value, s.n_ops, s.n_deletes
FROM ranked r JOIN stats s USING (user_id)
WHERE r.rn = 1 AND r.op <> 'D'
ORDER BY r.user_id
""",
    group="relational",
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply: materialize the current table state from an
    insert/update/delete event log — the Debezium-consumer / MERGE
    steady-state shape that :func:`q_log_compact` (upsert-only) cannot
    express, because DELETE tombstones must *remove* keys: a user whose
    latest change is a delete is absent from the final state, regardless
    of history.  (Ops are derived from event_type: signup=I, error=D,
    else U.)  Lifetime op counts ride along so the resurrection case —
    deleted then re-inserted — is visible in the output.

    Scale shape: ONE shuffle by the primary key serves both the
    latest-row window and the op-count aggregate; ties break on
    event_id (total order, the oracle house rule).  In production the
    output feeds a MERGE into the manifest-committed table
    (sources/manifest_table.py) exactly like the foreachBatch upsert
    sink, with deletes mapped to tombstone rows.
    """
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "signup", "I")
        .otherwise("U")
    )
    log = ev.select(
        "user_id",
        op.alias("op"),
        (F.unix_micros(F.col("ts"))).alias("ts_us"),
        "value",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts_us").desc(), F.col("event_id").desc())
    w_all = Window.partitionBy("user_id")
    return (
        log.withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(w_all).cast("bigint"))
        .withColumn("n_deletes", F.count_if(F.col("op") == "D").over(w_all).cast("bigint"))
        .where((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.col("op").alias("last_op"),
            F.col("ts_us").alias("latest_ts_us"),
            F.col("value").alias("latest_value"),
            "n_ops",
            "n_deletes",
        )
        .orderBy("user_id")
    )


#: EWMA frame length (half-life decay 0.5 per step; 2^-8 tail truncation)
EWMA_FRAME = 8


@query(
    "q_ewma",
    oracle=f"""
SELECT user_id, event_id,
       epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value,
       list_reduce(
         list(CAST(value AS DOUBLE)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {EWMA_FRAME - 1} PRECEDING AND CURRENT ROW),
         (acc, x) -> acc * 0.5 + x
       ) AS ewma
FROM events
""",
    group="relational",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user — the time-series
    smoothing primitive (alerting baselines, trend features) bounded to
    an {EWMA_FRAME}-row frame (the truncated tail weight is 2^-8; a true
    infinite-history EWMA is a sequential recurrence no engine
    parallelizes).

    Cross-engine float exactness WITHOUT transcendentals: the weighted
    sum is evaluated as the left fold ``acc*0.5 + v`` over the ordered
    frame (Spark ``aggregate`` starting at 0.0, DuckDB ``list_reduce``
    seeding with the first element — algebraically identical step
    sequences), so every operation is an exact halving plus an add in
    the same order; no ``pow`` whose libm rounding could differ.  One
    shuffle by user_id; the frame list is bounded, so state per row is
    O({EWMA_FRAME}).
    """
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_FRAME - 1), 0)
    )
    frame = F.collect_list(F.col("value").cast("double")).over(w)
    ewma = F.aggregate(frame, F.lit(0.0), lambda acc, x: acc * F.lit(0.5) + x)
    return ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "value",
        ewma.alias("ewma"),
    )  # row-level output: no trailing sort (SCALE.md hot-spot rule #3)


@query(
    "q_cumulative_uniques",
    oracle="""
WITH first_seen AS (
  SELECT user_id,
         MIN(CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)) AS d
  FROM events GROUP BY user_id
),
per_day AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS new_users FROM first_seen GROUP BY d
)
SELECT d AS day,
       new_users,
       CAST(SUM(new_users) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM per_day
ORDER BY day
""",
    group="relational",
)
def q_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the growth-curve query.  A
    windowed ``COUNT(DISTINCT) OVER`` does not exist in either engine
    (distinct state per frame is inherently non-mergeable); the
    scale-correct re-expression is first-seen reduction: each user
    contributes exactly once at their MIN day, so cumulative uniques =
    running sum of the per-day first-seen counts.

    Shuffles: one combinable agg by user_id (corpus-scale), one tiny agg
    by day, and the running window over the DAYS relation —
    calendar-bounded, so the single-partition window is O(days), never
    corpus-scale.  At 100 TB the first-seen table is the thing you
    persist and incrementally maintain (MERGE new users per batch); the
    growth curve is then a metadata-scale rollup.
    """
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    first_seen = (
        ev.select("user_id", F.floor(F.unix_seconds(F.col("ts")) / 86400).cast("bigint").alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("d"))
    )
    per_day = first_seen.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_day.select(
            F.col("d").alias("day"),
            "new_users",
            F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
        )
        .orderBy("day")
    )


from .common import dsum_sql  # noqa: E402


@query(
    "q_mv_incremental",
    oracle=f"""
WITH final AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderkey % 8 = 0 THEN o_totalprice + 500.0
              ELSE o_totalprice END AS p
  FROM orders WHERE o_orderkey % 4 IN (0, 2, 3)
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {dsum_sql('p')} AS total
FROM final GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    group="relational",
)
def q_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: merge a CDC changelog
    into a stored aggregate WITHOUT rescanning the base facts — the
    standard retraction-delta algorithm (each change contributes a
    signed delta: INSERT (+1, +new), DELETE (−1, −old), UPDATE
    (0, new−old); deltas roll up per group and add onto the stored MV).
    The harness synthesizes both sides from ``orders``: the MV covers
    keys %4 ∈ {{0,1,2}}, the changelog inserts %4 == 3, deletes %4 == 1,
    and updates %8 == 0 (price +500) — so every op kind must apply, and
    the result must equal a full recompute over the final state (the
    oracle) bit-for-bit, which only holds if the decimal-accumulated
    totals cancel the retracted contributions exactly.

    Scale shape: this is THE pattern that turns an O(100 TB) nightly
    rebuild into an O(daily-delta) merge — the stored MV is
    group-cardinality (checkpointed here to pin 'no base rescan'; a
    plan test asserts the merge's MV side is the checkpoint, not a
    parquet scan), the changelog is scanned once, and the merge is a
    group-key full-outer join both sides of which are tiny.  Groups
    whose count reaches zero are dropped, completing delete semantics.
    """
    prepare(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    # the "stored" MV over yesterday's base (group-cardinality, pinned)
    mv = mv_build(orders.where(F.col("o_orderkey") % 4 != 3)).localCheckpoint(
        eager=False
    )
    # the changelog, synthesized in ONE pass (in production: the input)
    delta = changelog_deltas(orders_changelog(orders))
    return mv_finalize(mv_merge(mv, delta))


def _dec(c):
    return c.cast("decimal(38,10)")


def mv_build(base: DataFrame) -> DataFrame:
    """The stored MV shape: per-priority count + exact decimal total."""
    return base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(_dec(F.col("o_totalprice"))).alias("tot"),
    )


def orders_changelog(orders: DataFrame) -> DataFrame:
    """The synthetic CDC changelog over ``orders``: inserts %4 == 3,
    deletes %4 == 1, updates %8 == 0 (price +500) — one scan."""
    k = F.col("o_orderkey")
    op = (
        F.when(k % 4 == 3, F.lit("I"))
        .when(k % 4 == 1, F.lit("D"))
        .when(k % 8 == 0, F.lit("U"))
    )
    return orders.withColumn("op", op).where(F.col("op").isNotNull())


def changelog_deltas(chg: DataFrame) -> DataFrame:
    """Signed retraction deltas per group: INSERT (+1, +new), DELETE
    (−1, −old), UPDATE (0, new−old) — decimal-exact so retracted
    contributions cancel bit-for-bit."""
    p = F.col("o_totalprice")
    return (
        chg.select(
            "o_orderpriority",
            F.when(F.col("op") == "I", 1)
            .when(F.col("op") == "D", -1)
            .otherwise(0)
            .alias("d_cnt"),
            F.when(F.col("op") == "I", _dec(p))
            .when(F.col("op") == "D", -_dec(p))
            .otherwise(_dec(p + F.lit(500.0)) - _dec(p))
            .alias("d_tot"),
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("d_cnt").alias("d_cnt"), F.sum("d_tot").alias("d_tot"))
    )


def mv_merge(mv: DataFrame, delta: DataFrame) -> DataFrame:
    """Apply grouped deltas onto the stored MV (same shape out, so the
    merge composes across micro-batches); zero-count groups drop."""
    zero = F.lit(0).cast("decimal(38,10)")
    return (
        mv.join(delta, "o_orderpriority", "full_outer")
        .select(
            "o_orderpriority",
            (F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(F.col("d_cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cnt"),
            (F.coalesce(F.col("tot"), zero) + F.coalesce(F.col("d_tot"), zero))
            .cast("decimal(38,10)")
            .alias("tot"),
        )
        .where(F.col("cnt") > 0)
    )


def mv_finalize(mv: DataFrame) -> DataFrame:
    """Stored MV shape → the query's output contract."""
    return mv.select(
        "o_orderpriority",
        F.col("cnt").cast("bigint").alias("n_orders"),
        F.col("tot").cast("double").alias("total"),
    ).orderBy("o_orderpriority")
