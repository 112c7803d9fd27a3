#!/usr/bin/env python
"""Nested-evolution feed drain: vectorized struct rebuild vs the per-row
value-space fallback (VERDICT r9 #5 "Done" criterion — the vectorized
path must be ≥5× on a nested-evolution backlog).

A table logs N rows of a nested record under writer W; the reader R
renames the nested child and adds a defaulted one — the exact shape that
pre-r10 routed every row through resolve_datum.  The same backlog drains
through the manifest_feed stream twice: once with the r10 vectorized
plan (struct rebuild from child arrays), once with the fallback forced
(monkeypatched planner), and the wall ratio is printed.

Usage: python feed_vector_soak.py [out_json]   Env: FEED_SOAK_ROWS
"""

from __future__ import annotations

import json
import os
import sys
import time

_N_CHILD = 16
_W_CHILDREN = ",".join(
    f'{{"name":"x{i}","type":"long"}}' for i in range(_N_CHILD)
)
_R_CHILDREN = ",".join(
    ['{"name":"y0","type":"long","aliases":["x0"]}']
    + [f'{{"name":"x{i}","type":"long"}}' for i in range(1, _N_CHILD)]
    + ['{"name":"z","type":"string","default":"d"}']
)
W = (
    '{"type":"record","name":"R","fields":['
    '{"name":"k","type":"long"},'
    f'{{"name":"n","type":{{"type":"record","name":"N","fields":[{_W_CHILDREN}]}}}}]}}'
)
R = (
    '{"type":"record","name":"R","fields":['
    '{"name":"k","type":"long"},'
    f'{{"name":"n","type":{{"type":"record","name":"N","fields":[{_R_CHILDREN}]}}}}]}}'
)


def drain(spark, t: str, sink: str, force: bool = False) -> float:
    from anglerfish_spark.streaming.stateful import await_or_fail
    from anglerfish_spark.streaming.table_feed import (
        FORMAT_NAME,
        register_manifest_feed,
    )

    register_manifest_feed(spark)
    acc = {"n": 0}

    def _count(batch, _epoch):
        acc["n"] += batch.count()

    t0 = time.time()
    reader = (
        spark.readStream.format(FORMAT_NAME)
        .option("table", t)
        .option("startingVersion", "0")
        .option("forcePydatum", "true" if force else "false")
        .load()
    )
    q = (
        reader.writeStream.foreachBatch(_count)
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    await_or_fail(q)
    return time.time() - t0, acc["n"]


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession, functions as F

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from anglerfish_spark.sources import manifest_table as mt
    from anglerfish_spark.streaming import table_feed as tf

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    rows = int(os.environ.get("FEED_SOAK_ROWS", "200000"))
    t = tempfile.mkdtemp(prefix="anglerfish_feedsoak_")
    df = spark.range(rows).select(
        F.col("id").alias("k"),
        F.struct(
            *[(F.col("id") + i).alias(f"x{i}") for i in range(_N_CHILD)]
        ).alias("n"),
    )
    mt.append_evolved(spark, t, df, W)
    mt.append_evolved(spark, t, mt.snapshot(spark, t).limit(0), W, reader_schema=R)

    drain(spark, t, "soak_warmup")  # cold-start: stream setup, JVM warm
    wall_vec, n_vec = drain(spark, t, "soak_vec")
    wall_py, n_py = drain(spark, t, "soak_py", force=True)
    assert n_vec == n_py == rows, (n_vec, n_py, rows)
    out = {
        "rows": rows,
        "vectorized_wall_sec": round(wall_vec, 2),
        "pydatum_wall_sec": round(wall_py, 2),
        "speedup": round(wall_py / wall_vec, 2),
    }
    print(json.dumps(out, indent=1))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
