"""Chronological-segment file source: the test-harness stand-in for a
Kafka topic.

Splits a batch DataFrame into ``n`` single-file segments by an event-time
column and yields a file-source STREAMING DataFrame that delivers exactly
one segment per micro-batch (``maxFilesPerTrigger=1`` over mtime-ordered
files) — so any cross-batch state the operator under test carries is
genuinely exercised across micro-batch boundaries, with the same
per-partition time-ordering guarantee a Kafka topic gives.  Within a
segment, row order is arbitrary (as within a fetched Kafka batch).
"""

from __future__ import annotations

import os
import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@contextmanager
def chronological_segments(
    spark: SparkSession, df: DataFrame, ts_col: str = "ts_us", n: int = 3
):
    """Yield a streaming DataFrame over ``n`` chronological segments of
    ``df`` (``ts_col`` must be a numeric event-time column, e.g. unix
    micros — JSON-safe).  The temporary segment files live for the body
    of the ``with`` block; run the streaming query inside it."""
    lo, hi = df.agg(F.min(ts_col), F.max(ts_col)).first()
    if lo is None or hi is None:
        raise ValueError(
            f"chronological_segments: input has no rows (or {ts_col!r} is "
            "all-null) — a streaming test over zero segments is vacuous"
        )
    span = max(hi - lo + 1, 1)
    seg = F.least(F.lit(n - 1), ((F.col(ts_col) - F.lit(lo)) * n / span).cast("int"))
    with tempfile.TemporaryDirectory(prefix="anglerfish_seg_") as d:
        src = os.path.join(d, "src")
        os.makedirs(src)
        for s in range(n):
            part = os.path.join(d, f"part{s}")
            df.where(seg == s).coalesce(1).write.json(part)
            jfs = [f for f in os.listdir(part) if f.endswith(".json")]
            dst = os.path.join(src, f"seg{s}.json")
            # a zero-row segment (skewed ts distribution) may write no
            # part file — deliver an empty micro-batch, not a crash
            with open(dst, "wb") as out:
                for jf in jfs:
                    with open(os.path.join(part, jf), "rb") as src_f:
                        out.write(src_f.read())
            os.utime(dst, (1_000_000 + s, 1_000_000 + s))
        yield (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
