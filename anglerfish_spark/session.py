"""SparkSession construction with scale-oriented defaults.

The engine targets large clusters (the design point is ~100 TB inputs on
1000 executors); locally we run ``local[N]``.  The defaults below are the
ones that matter at both scales:

* AQE on — runtime coalescing of shuffle partitions and skew-join splitting.
* ``spark.sql.session.timeZone=UTC`` — deterministic timestamp semantics
  (parquet test data carries naive timestamps; UTC makes Spark read them
  with the same wall clock DuckDB sees).
* Arrow enabled — Pandas UDF / ``mapInPandas`` paths use Arrow batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _default_driver_mem() -> str:
    """Driver-heap default: $SPARK_GRAFT_DRIVER_MEM if set, else
    min(8g, half of physical RAM).  The cap matters on small hosts — an
    unconditional 8g can fail JVM launch or swap a 4 GB box; half-of-RAM
    keeps the local-mode session usable everywhere while 8g remains the
    roomy default on the 128 GiB target."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        half_mb = max(1024, total // 2 // (1 << 20))
        return f"{min(8192, half_mb)}m"
    except (ValueError, OSError, AttributeError):
        return "8g"


def configure(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Apply engine defaults to a builder (idempotent, driver-friendly)."""
    return (
        # local mode puts driver + all 32 executor threads in ONE JVM whose
        # default heap is 1g — a 32-task stage over a codegen-heavy plan can
        # OOM it and take the whole session down.  Only effective before the
        # JVM starts (silently inert on an existing one); a cluster's
        # spark-submit settings win as usual.  SPARK_GRAFT_DRIVER_MEM
        # overrides; the default caps at half the host's physical RAM.
        builder.config("spark.driver.memory", _default_driver_mem())
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        # TIME is feature-flagged in Spark 4.1; the Avro time-millis/micros
        # logical types map to it (codec/logical.py)
        .config("spark.sql.timeType.enabled", "true")
    )


def get_spark(app_name: str = "anglerfish_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when not attached to a
    cluster; on a real cluster leave it unset and submit normally.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_MASTER" not in os.environ:
        master = f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    if master:
        builder = builder.master(master)
    return configure(builder).getOrCreate()


def prepare(spark: SparkSession) -> SparkSession:
    """Set the runtime-settable engine confs on an externally-created session.

    The driver harness owns its own SparkSession; queries call this to pin
    the semantics that must match the DuckDB oracle (UTC session timezone)
    and the adaptive-execution knobs that are runtime-settable.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # ANSI pinned: with ansi=false a decimal-overflow silently nulls the
    # dsum contract instead of raising; the engine's semantics assume
    # Spark 4's default strict mode even under a hostile host session
    spark.conf.set("spark.sql.ansi.enabled", "true")
    # Arrow on: localdata.local_df routes driver-literal tables through
    # pandas+Arrow (JVM-side batches — no Python-worker round-trips,
    # SCALE.md #22); without this flag it silently degrades to pickle
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    try:  # TIME logical-type support (static-only in some builds → best effort)
        spark.conf.set("spark.sql.timeType.enabled", "true")
    except Exception:
        pass
    # stateful streaming ops don't AQE-coalesce; an externally-created
    # session would otherwise run them with 200 shuffle partitions
    spark.conf.set("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
    # the engine buckets its index tables ON PURPOSE (dedup fp/band,
    # inverted index): DisableUnnecessaryBucketedScan would flip a
    # filter-only index probe back to a plain scan and forfeit bucket
    # pruning (SelectedBucketsCount) — keep bucketed scans bucketed
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    return spark
