"""True Structured-Streaming path: the same window builders behind
``readStream`` produce the same results as batch."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from anglerfish_spark.sources.registry import load_table
from anglerfish_spark.streaming.windows import tumbling_agg


def test_streaming_tumble_matches_batch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        ev.write.json(src)
        schema = ev.schema

        stream = spark.readStream.schema(schema).json(src)
        assert stream.isStreaming
        agg = tumbling_agg(
            stream,
            "ts",
            "1 hour",
            keys=("event_type",),
            aggs=(F.count(F.lit(1)).alias("cnt"),),
            watermark="1 hour",
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("tumble_smoke")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = spark.sql("SELECT * FROM tumble_smoke").collect()
        batch = tumbling_agg(
            ev, "ts", "1 hour", keys=("event_type",), aggs=(F.count(F.lit(1)).alias("cnt"),)
        ).collect()
        # append mode only emits windows the watermark has closed; every
        # emitted row must match its batch counterpart
        batch_map = {(r["window_start"], r["event_type"]): r["cnt"] for r in batch}
        assert len(got) > 0
        for r in got:
            assert batch_map[(r["window_start"], r["event_type"])] == r["cnt"]


def test_approx_distinct_error_bound(spark, sf_dir):
    from anglerfish_spark.operators.relational_ext import q_approx_distinct

    rows = q_approx_distinct(spark, sf_dir).collect()
    assert rows and all(r["approx_ok"] for r in rows), rows


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """True stream-stream join: both sides watermarked file streams; the
    joined row set must equal the batch interval join."""
    from anglerfish_spark.streaming.joins import interval_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/src"
        ev.write.json(src)
        schema = ev.schema

        def side(kind):
            s = spark.readStream.schema(schema).json(src)
            return s.where(F.col("event_type") == kind).withWatermark("ts", "2 hours")

        joined = interval_join(side("click"), side("purchase"))
        q = (
            joined.select("click_id", "purchase_id")
            .writeStream.format("memory")
            .queryName("ssjoin_smoke")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

        got = {
            (r["click_id"], r["purchase_id"])
            for r in spark.sql("SELECT * FROM ssjoin_smoke").collect()
        }
        batch = {
            (r["click_id"], r["purchase_id"])
            for r in interval_join(
                ev.where(F.col("event_type") == "click"),
                ev.where(F.col("event_type") == "purchase"),
            )
            .select("click_id", "purchase_id")
            .collect()
        }
        assert len(batch) > 0
        assert got == batch
