"""Small driver-local DataFrames without the pickle-RDD tax.

``spark.createDataFrame(list_of_rows)`` parallelizes PICKLED rows across
``defaultParallelism`` partitions, and evaluating each partition costs a
Python-worker round-trip.  On local[32] that is 32 round-trips per
downstream stage — ~0.5 s wall when they run in parallel, and ~4.2 s when
a ``coalesce(1)`` forces one task to drain all 32 sequentially (measured
on THREE rows; SCALE.md #22).  The same applies on a real cluster: a
driver-literal table should never need Python workers at scan time.

Routing the rows through pandas + Arrow instead makes the scan a JVM-side
``ArrowConverters`` read — no Python worker anywhere, ~100x faster for the
tiny literal tables the codec queries use.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def local_df(
    spark: SparkSession,
    rows: Sequence[tuple],
    schema,
    single_partition: bool = False,
) -> DataFrame:
    """Create a DataFrame from driver-local rows via pandas + Arrow.

    ``schema`` is a column-name list, DDL string, or StructType — same
    contract as ``createDataFrame``.  ``single_partition=True`` coalesces
    to one partition (cheap here: the parents are JVM Arrow batches, so
    unlike the pickle path there is no per-parent Python round-trip to
    serialize).  Falls back to the classic path for shapes the Arrow
    converter rejects.
    """
    try:
        if isinstance(schema, (list, tuple)):
            # object dtype per column: pandas must NOT coerce (an int
            # column containing None silently becomes float64, inferring
            # DOUBLE where createDataFrame(rows) inferred BIGINT — ADVICE
            # r6).  Arrow then infers each type from the VALUES, matching
            # the pickle path's row-based inference for null-bearing ints.
            # Rows may be positional sequences OR mappings/Rows keyed by
            # column name (ADVICE r7: positional indexing alone silently
            # narrowed the accepted contract).
            from collections.abc import Mapping

            rows = list(rows)
            cols = {
                c: pd.Series(
                    [r[c] if isinstance(r, Mapping) else r[i] for r in rows],
                    dtype="object",
                )
                for i, c in enumerate(schema)
            }
            pdf = pd.DataFrame(cols, columns=list(schema))
            df = spark.createDataFrame(pdf)
        else:
            df = spark.createDataFrame(
                pd.DataFrame.from_records(list(rows)), schema=schema
            )
    except Exception:
        df = spark.createDataFrame(list(rows), schema)
    if single_partition:
        df = df.coalesce(1)
    return df
