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
