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
        q.awaitTermination(300)
    updates = spark.sql(f"SELECT * FROM {name}")
    return (
        updates.groupBy("user_id").agg(F.max("cnt").alias("cnt")).orderBy("user_id")
    )
