"""Streaming joins and streaming dedup (batch-checkable analogues + the
true ``readStream`` path, exercised in tests/test_streaming.py).

Stream-stream interval join: the batch analogue is an equi-join on the key
with a time-range residual — Spark keeps the hash join on ``user_id`` and
applies the interval post-probe.  In streaming mode the SAME plan runs with
``withWatermark`` on both sides; the watermark plus the interval bound is
what lets Spark expire join state, so memory is O(key-cardinality x
interval), not unbounded — the canonical Structured Streaming join recipe.

Streaming dedup: ``dropDuplicatesWithinWatermark`` keeps the first row per
key within watermark bounds; the deterministic batch analogue keeps the
(ts, event_id)-minimal row per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..session import prepare
from ..sources.registry import load_table
from .stateful import await_or_fail

JOIN_WINDOW = "1 hour"  # purchases attributed to a click within this window


def interval_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Attribute each purchase to clicks it follows within JOIN_WINDOW.

    Works unchanged on batch or streaming inputs (for streaming, both
    sides must carry ``withWatermark`` so join state expires).
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {JOIN_WINDOW}")),
    )


@query(
    "q_stream_interval_join",
    oracle="""
SELECT c.event_id AS click_id, c.user_id, p.event_id AS purchase_id,
       p.value AS purchase_value,
       epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) AS lag_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = c.user_id
 AND p.ts > c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
ORDER BY click_id, purchase_id
""",
    group="streaming",
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (stream-stream join shape): purchases within 1 hour
    after a click by the same user.  Batch analogue of the watermarked
    streaming join — identical plan, state bounded by watermark+interval
    when run on streams (see tests/test_streaming.py)."""
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    joined = interval_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
    )
    return joined.select(
        "click_id",
        "user_id",
        "purchase_id",
        "purchase_value",
        (F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts"))).alias("lag_us"),
    )  # no trailing sort: row-level output


@query(
    "q_stream_dedup",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id, event_type) AS n_events
  FROM events
)
SELECT user_id, event_type, event_id AS first_event_id,
       epoch_us(CAST(ts AS TIMESTAMP)) AS first_ts_us, n_events
FROM ranked WHERE rn = 1
ORDER BY user_id, event_type
""",
    group="streaming",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user, type) — the deterministic batch analogue of
    streaming ``dropDuplicatesWithinWatermark`` (which keeps the first
    arrival per key; batch makes "first" well-defined via (ts, event_id)).
    One shuffle on the dedup key, window + filter, no global sort."""
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    cw = Window.partitionBy("user_id", "event_type")
    return (
        ev.select(
            "user_id",
            "event_type",
            F.col("event_id"),
            "ts",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(cw).alias("n_events"),
        )
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.unix_micros(F.col("ts")).alias("first_ts_us"),
            "n_events",
        )
    )  # no trailing sort: row-level output


@query(
    "q_stream_enrich",
    oracle=f"""
SELECT CAST(FLOOR(epoch(CAST(e.ts AS TIMESTAMP)) / 21600) * 21600 AS BIGINT) AS window_start,
       c.c_mktsegment AS mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {{dsum}} AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
ORDER BY window_start, mktsegment
""".format(dsum="CAST(CAST(SUM(CAST(e.value AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"),
    group="streaming",
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment — the third join of the streaming matrix
    (stream-stream: q_stream_interval_join; stream dedup: q_stream_dedup):
    a REAL Structured Streaming job joins the event stream to the static
    ``customer`` dimension (broadcast — dimension state is never keyed
    into the state store; Spark re-plans the static side per micro-batch)
    and aggregates 6-hour tumbling windows per market segment in complete
    output mode.  The finalized table must equal the batch join+group
    oracle exactly, decimal-sum contract included.

    At 100 TB the static side is the slowly-changing dimension snapshot
    (the manifest table's current version); stream-static is the shape
    where NO watermark is needed on the dimension and the stream side's
    state is only the window aggregates.
    """
    prepare(spark)
    import tempfile

    from ..operators.common import dsum

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "value"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    with tempfile.TemporaryDirectory(prefix="anglerfish_enrich_") as d:
        src = f"{d}/src"
        ev.write.json(src)
        stream = spark.readStream.schema(ev.schema).json(src)
        enriched = stream.withColumn(
            "ts", F.timestamp_micros(F.col("ts_us"))
        ).join(F.broadcast(cust), "user_id")
        agg = (
            enriched.groupBy(
                F.window("ts", "6 hours").alias("w"), F.col("c_mktsegment")
            )
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events"),
                dsum(F.col("value")).alias("total_value"),
            )
        )
        name = f"stream_enrich_{abs(hash(sf_dir)) % 10**8}"
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        await_or_fail(q)
    return (
        spark.sql(f"SELECT * FROM {name}")
        .select(
            F.unix_seconds(F.col("w.start")).cast("bigint").alias("window_start"),
            F.col("c_mktsegment").alias("mktsegment"),
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "mktsegment")
    )
