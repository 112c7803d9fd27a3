"""Streaming sinks: micro-batch keyed upsert via ``foreachBatch``.

The reference's roadmap ends at "write to Kafka / Hadoop FS"
(/root/reference/README.md:23-27); the engine supplies the production
sink shape Structured Streaming actually uses for keyed materialization:
``foreachBatch`` + MERGE-by-key into a table.

Without a transactional table format on the classpath (Delta/Iceberg ship
MERGE INTO; plain parquet does not), the upsert is an anti-join + union +
atomic directory swap — the same logical MERGE, minus snapshot isolation.
At 100 TB you would swap the implementation body for ``MERGE INTO`` on a
lakehouse table and keep the exact same ``foreachBatch`` wiring; the
per-batch cost stays O(batch ⋈ table-partition), and writing
partition-pruned (merge keys carry the partition column) keeps the
rewrite localized rather than full-table.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame


def upsert_batch(table_path: str, batch: DataFrame, key_cols: list[str]) -> None:
    """MERGE one micro-batch into the parquet table at ``table_path``:
    rows matching on ``key_cols`` are replaced, others inserted.  Within
    a batch, the last row per key wins (dropDuplicates on the key after a
    deterministic sort would pin intra-batch order; callers that care
    pre-dedup the batch)."""
    spark = batch.sparkSession
    batch = batch.dropDuplicates(key_cols)
    if os.path.isdir(table_path):
        existing = spark.read.parquet(table_path)
        keep = existing.join(batch.select(*key_cols), key_cols, "left_anti")
        merged = keep.unionByName(batch)
    else:
        merged = batch
    tmp = os.path.join(
        tempfile.gettempdir(), f"anglerfish_upsert_{uuid.uuid4().hex}"
    )
    merged.write.mode("overwrite").parquet(tmp)
    # atomic-enough local swap (a lakehouse MERGE replaces this dance)
    old = table_path + ".old"
    if os.path.isdir(table_path):
        os.rename(table_path, old)
    shutil.move(tmp, table_path)
    shutil.rmtree(old, ignore_errors=True)


def start_upsert_sink(
    stream: DataFrame,
    table_path: str,
    key_cols: list[str],
    checkpoint: str | None = None,
    trigger_available_now: bool = True,
    output_mode: str = "update",
):
    """Wire a streaming DataFrame into the keyed-upsert sink.

    Returns the StreamingQuery; callers ``awaitTermination`` it.  Each
    micro-batch is merged exactly once (foreachBatch gives at-least-once;
    the key-replace merge makes replays idempotent — the effectively-once
    recipe).  ``update`` output mode is the natural pairing: every batch
    carries exactly the keys whose aggregates changed, so the merge
    touches only changed keys — unlike ``complete``, which would rewrite
    the world each batch."""
    writer = stream.writeStream.outputMode(output_mode).foreachBatch(
        lambda batch, _epoch: upsert_batch(table_path, batch, key_cols)
    )
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
