"""Dataset catalog / IO helpers.

The reference's roadmap I/O surface (Avro files, Hadoop FS, Kafka —
/root/reference/README.md:21-27, never implemented there) maps onto Spark's
datasource API; here we expose a thin catalog over the driver-provided
parquet star schema plus generic readers/writers for parquet/json/csv/avro.

Scale notes: readers go through ``spark.read`` so partition pruning,
predicate pushdown and vectorized parquet scans all apply.  Nothing here
collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: tables the driver materializes per scale factor (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: small dimension tables that should always be broadcast in joins; at the
#: 100 TB design point these stay < 10 MB (region: 5 rows, nation: 25) so a
#: broadcast hash join avoids shuffling the fact side entirely.
BROADCAST_TABLES = frozenset({"region", "nation"})


#: fan-out gate for small single-row-group inputs (see load_table)
_FANOUT_MIN_BYTES = 256 << 10
_FANOUT_MAX_BYTES = 256 << 20


def _scan_parallelism(path: str) -> int | None:
    """Number of split points a parquet scan of ``path`` can actually use
    (row groups are the splitting unit).  None when unknowable cheaply."""
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).num_row_groups
    except Exception:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str, fanout: bool = False) -> DataFrame:
    """Read one catalog table from a scale-factor directory.

    ``events.ts`` is canonicalized to a microsecond ``TimestampType`` (LTZ)
    column regardless of how the parquet stores it, so every downstream
    epoch-arithmetic site (``unix_micros``, window-bound casts) sees one
    type.  Storage forms handled:

    * parquet TIMESTAMP(NANOS) — Spark 4 can't read it natively; the legacy
      conf reads it as nanos-since-epoch LONG and we truncate to µs
      (matching DuckDB's ns→µs cast), keeping the raw nanos as ``ts_ns``;
    * TIMESTAMP(MICROS) isAdjustedToUTC=false → Spark ``TIMESTAMP_NTZ``;
      the session timezone is pinned to UTC (session.prepare), so the cast
      to LTZ preserves the wall clock DuckDB's ``epoch()`` sees;
    * TIMESTAMP(MICROS) isAdjustedToUTC=true → already ``TimestampType``.

    **Small-input fan-out** (``fanout=True``): a parquet scan parallelizes
    at row-group granularity, so a table stored as one (or few) row groups
    runs every downstream map stage on as many cores — one — no matter the
    cluster.  Operators whose map stage is CPU-dense (codec decode, shingle
    hashing, embedding math) request a one-time round-robin ``repartition``
    to the session's default parallelism.  Gated by size (big enough to
    matter, small enough that the shuffle is free) and by actual row-group
    deficit; shuffle-first operators must NOT request it — their own first
    exchange already redistributes, and the extra one is pure cost.  At the
    100 TB design point real tables blow past the 256 MB gate (and carry
    many row groups), so this never fires there.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog: {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):  # TIMESTAMP(NANOS) via legacy conf
            df = df.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
        elif isinstance(ts_type, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if fanout and name not in BROADCAST_TABLES:
        try:
            nbytes = os.path.getsize(path)
        except OSError:
            nbytes = 0
        if _FANOUT_MIN_BYTES <= nbytes <= _FANOUT_MAX_BYTES:
            target = spark.sparkContext.defaultParallelism
            splits = _scan_parallelism(path)
            if splits is not None and splits < target:
                df = df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read several catalog tables at once."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


class Catalog:
    """Lazy per-scale-factor table catalog.

    ``Catalog(spark, sf_dir).lineitem`` returns the DataFrame; reads are
    cached per name (the *plan*, not the data — nothing is materialized).
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            self._cache[name] = load_table(self.spark, self.sf_dir, name)
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)


# --- generic IO -------------------------------------------------------------


def read(spark: SparkSession, fmt: str, path: str, schema=None, **options) -> DataFrame:
    """Generic reader: parquet/json/csv/text/orc/avro.

    JSON reads honour an explicit schema (strongly recommended at scale —
    schema inference is a full extra pass over the data).
    """
    reader = spark.read.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write(df: DataFrame, fmt: str, path: str, mode: str = "error", partition_by=None, **options) -> None:
    """Generic writer; ``partition_by`` produces hive-style partition dirs."""
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro datasource is on the classpath.

    The pip pyspark distribution ships avro-core but not the spark-avro
    connector; features that need ``from_avro``/``to_avro``/avro files are
    gated on this probe.
    """
    try:
        jvm = spark._jvm  # noqa: SLF001 - capability probe only
        jvm.java.lang.Class.forName("org.apache.spark.sql.avro.AvroFileFormat")
        return True
    except Exception:
        return False
