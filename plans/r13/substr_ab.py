#!/usr/bin/env python
"""A/B for the ExactSubstr gram stage ("Not yet optimized" #2):

  A (current): one gram relation, occurrence count as a window over
     partitionBy(g) — ships every (doc_id, pos, g) row through one
     exchange, no second pass over the explode lineage.
  B (candidate): eager localCheckpoint of the gram relation, then a
     combinable groupBy(g).count() for the hot grams and a BROADCAST
     semi-join back — the checkpointed grams are read twice but never
     re-exploded, and the gram rows are never shuffled at all.

Run:  SPARK_GRAFT_SF_DIR=<dir> python plans/r13/substr_ab.py [--runs N]
Prints per-run seconds for A/B alternating (A first), then verifies the
two final outputs are row-identical.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from anglerfish_spark.operators.dedup import SUBSTR_MIN_OCCURS, SUBSTR_N, gram_hashes
    from anglerfish_spark.operators.text import tokens
    from anglerfish_spark.session import get_spark, prepare
    from anglerfish_spark.sources.registry import load_table

    runs = 5
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])

    spark = get_spark("substr-ab")
    prepare(spark)

    def grams_rel():
        d = load_table(spark, SF_DIR, "documents", fanout=True)
        return (
            d.select("doc_id", gram_hashes(tokens(), SUBSTR_N).alias("gs"))
            .select("doc_id", F.posexplode("gs").alias("pos0", "g"))
            .select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
        )

    def downstream(spans):
        w_prev = (
            Window.partitionBy("doc_id")
            .orderBy("s")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_run = Window.partitionBy("doc_id").orderBy("s").rowsBetween(
            Window.unboundedPreceding, 0
        )
        merged = (
            spans.withColumn(
                "new_island",
                F.when(
                    F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)) + 1, 1
                ).otherwise(0),
            )
            .withColumn("island", F.sum("new_island").over(w_run))
            .groupBy("doc_id", "island")
            .agg((F.max("e") - F.min("s") + 1).alias("covered"))
        )
        return (
            merged.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_spans"),
                F.sum("covered").cast("bigint").alias("tokens_covered"),
            )
            .orderBy("doc_id")
        )

    def shape_a():
        grams = grams_rel()
        w_gram = Window.partitionBy("g")
        spans = (
            grams.withColumn("n", F.count(F.lit(1)).over(w_gram))
            .where(F.col("n") >= SUBSTR_MIN_OCCURS)
            .select(
                "doc_id",
                F.col("pos").alias("s"),
                (F.col("pos") + (SUBSTR_N - 1)).alias("e"),
            )
        )
        return downstream(spans)

    def shape_b():
        grams = grams_rel().localCheckpoint(eager=True)
        hot = (
            grams.groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= SUBSTR_MIN_OCCURS)
            .select("g")
        )
        spans = grams.join(F.broadcast(hot), "g", "left_semi").select(
            "doc_id",
            F.col("pos").alias("s"),
            (F.col("pos") + (SUBSTR_N - 1)).alias("e"),
        )
        return downstream(spans)

    # warm both once (JIT, parquet footers), then alternate
    for f in (shape_a, shape_b):
        f().write.format("noop").mode("overwrite").save()
    ts: dict[str, list[float]] = {"A": [], "B": []}
    for _ in range(runs):
        for key, f in (("A", shape_a), ("B", shape_b)):
            t0 = time.perf_counter()
            f().write.format("noop").mode("overwrite").save()
            ts[key].append(round(time.perf_counter() - t0, 3))
    for k, v in ts.items():
        print(k, v, "min", min(v), "median", statistics.median(v))

    ra = [tuple(r) for r in shape_a().collect()]
    rb = [tuple(r) for r in shape_b().collect()]
    print("identical:", ra == rb, f"rows={len(ra)}")
    spark.stop()


if __name__ == "__main__":
    main()
