"""Event-time windowing: tumbling / sliding / session windows + watermark.

The reference's roadmap stops at streaming I/O intentions
(/root/reference/README.md:21-27 — Kafka/FS2/Hadoop "coming up next", never
implemented); the engine supplies the actual operator surface on Spark's
native event-time machinery: ``F.window`` / ``F.session_window`` work
identically over batch DataFrames and Structured Streaming inputs, so every
builder here is verifiable against a SQL oracle in batch and usable
unchanged behind ``readStream``.

Scale notes: windowed aggregations are hash aggregations keyed by
(window, keys) — map-side combinable, no sort; session windows shuffle per
key once.  In true streaming, ``with_watermark`` bounds state retention;
the batch emulation computes the same cutoff from the data (one tiny
broadcast of a scalar max).

Determinism contract: window bounds are emitted as epoch *seconds*
(``window_start``), avoiding cross-engine timestamp-type hashing issues.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _flatten_window(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """window struct → epoch-second start/end columns, keys preserved."""
    cols = [
        F.col("window.start").cast("long").alias("window_start"),
        F.col("window.end").cast("long").alias("window_end"),
    ]
    others = [c for c in df.columns if c != "window"]
    return df.select(*cols, *others)


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling event-time windows (``F.window(ts, size)``).

    Works on batch and streaming inputs alike; pass ``watermark`` (e.g.
    ``"1 hour"``) for streaming state bounding / late-data drop.
    """
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.window(ts_col, size), *keys).agg(*aggs)
    return _flatten_window(out, keys)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    size: str,
    slide: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Sliding windows (``F.window(ts, size, slide)``): each event lands in
    ``size/slide`` windows; window starts align to the epoch."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.window(ts_col, size, slide), *keys).agg(*aggs)
    return _flatten_window(out, keys)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Session windows (``F.session_window``): a session merges events whose
    gap to the previous event is strictly less than ``gap``; the window ends
    ``gap`` after the last event."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    out = df.groupBy(F.session_window(ts_col, gap), *keys).agg(*aggs)
    cols = [
        F.col("session_window.start").cast("long").alias("session_start"),
        F.col("session_window.end").cast("long").alias("session_end"),
    ]
    others = [c for c in out.columns if c != "session_window"]
    return out.select(*cols, *others)


def drop_late(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Batch emulation of a watermark's late-data drop: discard rows older
    than ``max(ts) - delay``.

    In streaming, use ``withWatermark`` (the builders above take
    ``watermark=``); in batch the cutoff is computed from the data — one
    scalar aggregate broadcast back, no driver collect of data rows.
    """
    cutoff = df.agg(
        (F.max(ts_col) - F.expr(f"INTERVAL {delay}")).alias("_cutoff")
    )
    return df.join(F.broadcast(cutoff)).where(F.col(ts_col) >= F.col("_cutoff")).drop("_cutoff")


# ---------------------------------------------------------------------------
# registered queries (batch-checkable analogues on the events table)
# ---------------------------------------------------------------------------

from ..operators.common import dsum, dsum_sql  # noqa: E402
from ..registry import query  # noqa: E402
from ..session import prepare  # noqa: E402
from ..sources.registry import load_table  # noqa: E402


@query(
    "q_tumble",
    oracle=f"""
SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600 AS BIGINT) AS window_start,
       event_type, COUNT(*) AS cnt, {dsum_sql('value')} AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
    group="streaming",
)
def q_tumble(spark, sf_dir):
    """Tumbling 1-hour windows per event type."""
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    out = tumbling_agg(
        ev,
        "ts",
        "1 hour",
        keys=("event_type",),
        aggs=(F.count(F.lit(1)).alias("cnt"), dsum(F.col("value")).alias("sum_value")),
    )
    return out.drop("window_end").orderBy("window_start", "event_type")


@query(
    "q_slide",
    oracle=f"""
WITH e AS (
  SELECT event_type, value,
         CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 1800) * 1800 AS BIGINT) AS b0
  FROM events
),
x AS (
  SELECT event_type, value, b0 AS window_start FROM e
  UNION ALL
  SELECT event_type, value, b0 - 1800 FROM e
)
SELECT window_start, event_type, COUNT(*) AS cnt, {dsum_sql('value')} AS sum_value
FROM x GROUP BY 1, 2
ORDER BY window_start, event_type
""",
    group="streaming",
)
def q_slide(spark, sf_dir):
    """Sliding 1-hour windows every 30 minutes (each event in 2 windows)."""
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    out = sliding_agg(
        ev,
        "ts",
        "1 hour",
        "30 minutes",
        keys=("event_type",),
        aggs=(F.count(F.lit(1)).alias("cnt"), dsum(F.col("value")).alias("sum_value")),
    )
    return out.drop("window_end").orderBy("window_start", "event_type")


@query(
    "q_session",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t, value FROM events
),
s AS (
  SELECT user_id, event_id, t, value,
         CASE WHEN LAG(t) OVER w IS NULL
                OR t - LAG(t) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
g AS (
  SELECT user_id, t, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT user_id,
       CAST(FLOOR(epoch(MIN(t))) AS BIGINT) AS session_start,
       COUNT(*) AS cnt, {dsum_sql('value')} AS sum_value
FROM g GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
    group="streaming",
)
def q_session(spark, sf_dir):
    """Session windows with a 30-minute gap, per user."""
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    out = session_agg(
        ev,
        "ts",
        "30 minutes",
        keys=("user_id",),
        aggs=(F.count(F.lit(1)).alias("cnt"), dsum(F.col("value")).alias("sum_value")),
    )
    return out.drop("session_end").orderBy("user_id", "session_start")


@query(
    "q_watermark_late",
    oracle=f"""
WITH m AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS mx FROM events),
kept AS (
  SELECT e.* FROM events e, m
  WHERE CAST(e.ts AS TIMESTAMP) >= m.mx - INTERVAL 3 DAY
)
SELECT CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 86400) * 86400 AS BIGINT) AS window_start,
       COUNT(*) AS cnt, {dsum_sql('value')} AS sum_value
FROM kept GROUP BY 1 ORDER BY window_start
""",
    group="streaming",
)
def q_watermark_late(spark, sf_dir):
    """Watermark late-data drop (batch emulation) + daily tumble."""
    prepare(spark)
    ev = load_table(spark, sf_dir, "events")
    kept = drop_late(ev, "ts", "3 DAYS")
    out = tumbling_agg(
        kept,
        "ts",
        "1 day",
        aggs=(F.count(F.lit(1)).alias("cnt"), dsum(F.col("value")).alias("sum_value")),
    )
    return out.drop("window_end").orderBy("window_start")


@query(
    "q_stream_session",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t, value FROM events
),
s AS (
  SELECT user_id, event_id, t, value,
         CASE WHEN LAG(t) OVER w IS NULL
                OR t - LAG(t) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
g AS (
  SELECT user_id, t, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT user_id,
       CAST(FLOOR(epoch(MIN(t))) AS BIGINT) AS session_start,
       COUNT(*) AS cnt, {dsum_sql('value')} AS sum_value
FROM g GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
    group="streaming",
)
def q_stream_session(spark, sf_dir):
    """Session windows as a REAL Structured Streaming job: the same
    30-minute-gap sessionization as ``q_session``, but run with
    ``F.session_window`` + watermark in APPEND mode over chronological
    micro-batch segments (`streaming/segments.py`) — a session is
    emitted exactly once, when the watermark passes its end, so sessions
    SPANNING a micro-batch boundary are only correct if Spark's
    session-merging state genuinely carries across batches.  A sentinel
    event 40 minutes past the data's horizon (on a fake key, filtered
    out) pushes the final watermark beyond every real session's end so
    the availableNow run flushes them all.  Results must equal the batch
    gaps-and-islands oracle exactly, down to the decimal-accumulated
    ``sum_value``.

    Scale shape: session windows shuffle once on the grouping key; state
    per key is bounded by OPEN sessions only (append mode evicts a
    session at emission), expired by the watermark (RocksDB-backed on a
    real cluster).  The segment harness stands in for a Kafka topic with
    per-key time order (SURVEY §2.2 streaming; the reference's streaming
    roadmap, /root/reference/README.md:21-27, was never implemented).
    """
    prepare(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "value"
    )
    return stream_sessionize(spark, ev, sink=f"stream_sess_{abs(hash(sf_dir)) % 10**8}")


def stream_sessionize(
    spark,
    ev: DataFrame,
    gap: str = "30 minutes",
    n_segments: int = 4,
    sink: str = "stream_sessions",
) -> DataFrame:
    """Run the streaming session pipeline over a batch ``(user_id, ts_us,
    value)`` DataFrame: chronological segments → ``session_window`` in
    append mode → final sessions (see ``q_stream_session``).  The gap
    length in the sentinel offset is 30 minutes — keep ``gap`` ≤ that."""
    from ..localdata import local_df
    from .segments import chronological_segments
    from .stateful import await_or_fail

    hi = ev.agg(F.max("ts_us")).first()[0]
    sentinel = local_df(spark, [(-1, hi + 40 * 60 * 1_000_000, 0.0)], ev.schema)
    with chronological_segments(spark, ev.unionByName(sentinel), n=n_segments) as stream:
        evs = stream.select(
            "user_id", F.timestamp_micros("ts_us").alias("ts"), "value"
        ).withWatermark("ts", "1 second")
        sess = (
            evs.groupBy(F.session_window("ts", gap), "user_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                dsum(F.col("value")).alias("sum_value"),
            )
            .select(
                "user_id",
                F.col("session_window.start").cast("long").alias("session_start"),
                "cnt",
                "sum_value",
            )
        )
        q = (
            sess.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        await_or_fail(q)
    return (
        spark.sql(f"SELECT * FROM {sink}")
        .where(F.col("user_id") >= 0)
        .orderBy("user_id", "session_start")
    )
