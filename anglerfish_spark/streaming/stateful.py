"""Custom stateful streaming operator via ``applyInPandasWithState``.

The scale path for operators that windows can't express: per-key mutable
state maintained by the engine (RocksDB-backed on a real cluster), Arrow
batches in and out, watermark-driven state expiry.  Demonstrated here as a
per-user running event counter; the registered query runs a real
Structured Streaming job (availableNow over a file copy of the events
table) and its *final* counts are checked against an exact batch oracle —
streaming and batch must agree on totals.
"""

from __future__ import annotations

import json
import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..registry import query
from ..session import prepare
from ..sources.registry import load_table

def await_or_fail(q, timeout_sec: int = 300) -> None:
    """Block on a streaming query; fail loudly instead of silently reading
    a partially-populated sink if it has not finished within the timeout."""
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} did not finish in {timeout_sec}s"
        )


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("cnt", T.LongType()),
    ]
)
_STATE_SCHEMA = T.StructType([T.StructField("cnt", T.LongType())])


def _count_events(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful step: accumulate a per-user event count across batches."""
    (cnt,) = state.get if state.exists else (0,)
    for pdf in batches:
        cnt += len(pdf)
    state.update((cnt,))
    yield pd.DataFrame({"user_id": [key[0]], "cnt": [cnt]})


def stateful_user_counts(stream: DataFrame) -> DataFrame:
    """Apply the custom stateful counter to a streaming DataFrame."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _count_events,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@query(
    "q_stateful_count",
    oracle="""
SELECT user_id, COUNT(*) AS cnt
FROM events
GROUP BY user_id
ORDER BY user_id
""",
    group="streaming",
)
def q_stateful_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs an actual streaming job: events → file source → per-user
    stateful counter (applyInPandasWithState) → memory sink; counts are
    monotone, so the max update per key is the final total, which must
    equal the batch GROUP BY."""
    prepare(spark)
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    with tempfile.TemporaryDirectory(prefix="anglerfish_state_") as d:
        src = f"{d}/src"
        ev.write.json(src)
        stream = spark.readStream.schema(ev.schema).json(src)
        counted = stateful_user_counts(stream)
        name = f"stateful_{abs(hash(sf_dir)) % 10**8}"
        q = (
            counted.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        await_or_fail(q)
    updates = spark.sql(f"SELECT * FROM {name}")
    return (
        updates.groupBy("user_id").agg(F.max("cnt").alias("cnt")).orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# order-sensitive stateful pattern detection (streaming MATCH_RECOGNIZE)
# ---------------------------------------------------------------------------

# Per-user ``view click+ purchase`` state machine, continued ACROSS
# micro-batches (a click run that starts at the end of one batch and
# completes in the next is one match).  Since r6 the automaton is compiled
# from the SAME PatternSpec as the batch q_pattern_match — one spec, two
# engines, fuzz-differentialed in tests/test_patterns.py.  The compiled fn
# materializes and sorts the whole micro-batch once by (ts_us, event_id)
# (ADVICE r5: per-chunk sorting breaks users spanning Arrow chunks);
# cross-batch order is the source's responsibility (chronological segments
# here; a Kafka topic keyed by user delivers per-key order the same way).
from ..operators.patterns import VIEW_CLICK_PURCHASE, make_stateful_pattern_fn

_match_pattern, _PAT_OUT, _PAT_STATE = make_stateful_pattern_fn(VIEW_CLICK_PURCHASE)


@query(
    "q_stream_pattern",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         CASE WHEN event_type = LAG(event_type) OVER (
                PARTITION BY user_id ORDER BY ts, event_id)
              THEN 0 ELSE 1 END AS chg
  FROM events
),
runs0 AS (
  SELECT user_id, event_type, rn,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY rn
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM ordered
),
runs AS (
  SELECT user_id, run_id, MIN(event_type) AS typ,
         CAST(COUNT(*) AS BIGINT) AS len
  FROM runs0 GROUP BY user_id, run_id
),
seq AS (
  SELECT user_id, typ, len,
         LAG(typ)  OVER (PARTITION BY user_id ORDER BY run_id) AS prev_typ,
         LEAD(typ) OVER (PARTITION BY user_id ORDER BY run_id) AS next_typ
  FROM runs
),
matches AS (
  SELECT user_id, len FROM seq
  WHERE typ = 'click' AND prev_typ = 'view' AND next_typ = 'purchase'
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(SUM(len) AS BIGINT) AS total_clicks,
       CAST(MAX(len) AS BIGINT) AS max_click_run
FROM matches GROUP BY user_id
ORDER BY user_id
""",
    group="streaming",
)
def q_stream_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MATCH_RECOGNIZE: the q_pattern_match state machine run
    as a REAL Structured Streaming job whose state must survive
    micro-batch boundaries — events are split into three chronological
    segments (one file each, mtime-ordered, maxFilesPerTrigger=1), so a
    pattern spanning a segment boundary is only counted if the per-user
    state genuinely carries across batches.  Final per-user counters
    (all monotone) must equal the batch gaps-and-islands oracle exactly.

    The segment scaffolding stands in for a Kafka topic keyed by
    user_id, which delivers the same per-key ordering guarantee; the
    operator itself is the 100 TB shape — per-key state in the state
    store (RocksDB-backed in production), Arrow batches, no shuffle
    beyond the keyed grouping.
    """
    prepare(spark)
    import os

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros(F.col("ts")).alias("ts_us")
    )
    lo, hi = ev.agg(F.min("ts_us"), F.max("ts_us")).first()
    span = max(hi - lo + 1, 1)
    seg = F.least(F.lit(2), ((F.col("ts_us") - F.lit(lo)) * 3 / span).cast("int"))
    with tempfile.TemporaryDirectory(prefix="anglerfish_pat_") as d:
        src = f"{d}/src"
        os.makedirs(src)
        for s in range(3):
            part = f"{d}/part{s}"
            ev.where(seg == s).coalesce(1).write.json(part)
            (jf,) = [f for f in os.listdir(part) if f.endswith(".json")]
            dst = os.path.join(src, f"seg{s}.json")
            os.rename(os.path.join(part, jf), dst)
            os.utime(dst, (1_000_000 + s, 1_000_000 + s))
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        matched = stream.groupBy("user_id").applyInPandasWithState(
            _match_pattern,
            outputStructType=_PAT_OUT,
            stateStructType=_PAT_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        name = f"stream_pat_{abs(hash(sf_dir)) % 10**8}"
        q = (
            matched.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        await_or_fail(q)
    updates = spark.sql(f"SELECT * FROM {name}")
    return (
        updates.groupBy("user_id")
        .agg(
            F.max("n_matches").cast("bigint").alias("n_matches"),
            F.max("total_len").cast("bigint").alias("total_clicks"),
            F.max("max_len").cast("bigint").alias("max_click_run"),
        )
        .where(F.col("n_matches") >= 1)
        .orderBy("user_id")
    )
