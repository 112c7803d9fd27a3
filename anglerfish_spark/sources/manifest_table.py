"""Minimal manifest-committed table: the ACID seam for keyed sinks.

**Design note (VERDICT r4 "missing #3").**  The engine's keyed-upsert
sink (`streaming/sinks.py`) implements the MERGE shape over plain
parquet with a directory swap — correct locally, but a real 100 TB
deployment puts a transactional table format under it (Delta Lake /
Apache Iceberg, whose publicly documented designs this module mocks in
miniature).  What those formats actually add, distilled to the three
mechanisms the steady state needs:

1. **Snapshot = manifest, not directory listing.**  Readers resolve the
   latest ``_manifests/v{N}.json`` and read exactly the files it names;
   data files are invisible until a manifest references them, so a
   half-finished writer can never be read (atomicity without renaming
   data).
2. **Optimistic concurrency = create-exclusive on the next version.**
   A commit materializes as ``v{N+1}.json`` created with ``O_EXCL``;
   two writers racing for N+1 → exactly one wins, the loser re-reads
   the new snapshot and retries (Delta's "mutual exclusion on the log
   entry", Iceberg's atomic swap).
3. **Replay idempotency = transaction id in the manifest.**  A
   streaming ``foreachBatch`` replay presents the same ``txn_id``
   (source + batch id); if the current snapshot already recorded it,
   the commit is a no-op — effectively-once without relying on the
   merge being semantically idempotent.

The mock keeps MERGE as a full-snapshot rewrite (read snapshot →
anti-join → union → new files → commit).  A production format rewrites
only the files whose key ranges collide (file-level min/max pruning) —
the same protocol, a smaller rewrite set; the incremental-dedup index
(`operators/dedup.dedup_index_tables`) would layer its bucket layout on
such a table so the probe join stays exchange-free AND the ingest is
transactional.

Local filesystem only (os.rename / O_EXCL are atomic on POSIX); on an
object store the create-exclusive step is the piece you delegate to a
catalog / DynamoDB-style lock, exactly as the real formats document.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..errors import AnglerfishError
from ..registry import query
from ..session import prepare


class ConcurrentCommitError(AnglerfishError):
    """Another writer committed this version first; re-read and retry."""


_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, _MANIFEST_DIR, f"v{version:010d}.json")


def current_version(table: str) -> int:
    """Latest committed version; 0 = empty table (no snapshot)."""
    mdir = os.path.join(table, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return 0
    versions = [
        int(f[1:-5]) for f in os.listdir(mdir) if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions, default=0)


def read_manifest(table: str, version: int | None = None) -> dict:
    v = current_version(table) if version is None else version
    if v == 0:
        return {"version": 0, "files": [], "txn_id": None}
    with open(_manifest_path(table, v)) as f:
        return json.load(f)


def delete_groups(m: dict) -> list[dict]:
    """Normalize a manifest's equality-delete state to
    ``[{"key": col, "files": [rel, ...]}, ...]`` — one group per delete
    key (the modern ``delete_groups`` field, or the legacy single-key
    ``deletes`` + ``delete_key`` pair from pre-r7 manifests)."""
    if m.get("delete_groups"):
        return m["delete_groups"]
    if m.get("deletes"):
        return [{"key": m["delete_key"], "files": m["deletes"]}]
    return []


def snapshot(spark: SparkSession, table: str, version: int | None = None) -> DataFrame:
    """Read the table AS OF a committed snapshot (latest by default).
    Reading an empty table raises — the caller knows the schema, we
    don't (mirrors the real formats' behavior on a nonexistent table).

    Delegates to the composed read path (:mod:`read_path`), so schema
    evolution, merge-on-read equality deletes, and their interactions
    are applied uniformly — each delete group is one broadcast anti-join
    (a broadcast-sized side at any realistic delete rate), so reads stay
    a single scan + map-side filter until compaction folds the deletes
    in physically."""
    from .read_path import read_table

    df, _report = read_table(spark, table, version)
    return df


def stage_files(df: DataFrame, table: str) -> list[str]:
    """Write ``df`` as new data files under the table WITHOUT committing:
    invisible to every reader until a manifest names them."""
    rel = os.path.join(_DATA_DIR, uuid.uuid4().hex)
    df.write.parquet(os.path.join(table, rel))
    return [
        os.path.join(rel, f)
        for f in os.listdir(os.path.join(table, rel))
        if f.endswith(".parquet")
    ]


def commit(
    table: str,
    files: list[str],
    expected_version: int,
    txn_id: str | None = None,
    schema: str | None = None,
    filesets: list[dict] | None = None,
    stats: dict | None = None,
    delete_groups: list[dict] | None = None,
    pos_deletes: list[str] | None = None,
) -> int:
    """Commit ``files`` as snapshot ``expected_version + 1``.

    Create-exclusive on the manifest path is the whole concurrency
    protocol: a racing writer that already took the version leaves this
    one with ``ConcurrentCommitError`` — re-read the snapshot, rebase,
    retry.  Returns the committed version.

    Schema evolution (VERDICT r5 #4): ``schema`` records the snapshot's
    READER Avro schema; ``filesets`` partitions the files by the WRITER
    schema they were physically written under (an append-only commit
    keeps prior filesets verbatim — exactly how Iceberg/Delta manifests
    carry per-file schema ids so old files are never rewritten on an
    ADD COLUMN / RENAME).  Both optional: schema-less tables behave as
    before."""
    new_version = expected_version + 1
    os.makedirs(os.path.join(table, _MANIFEST_DIR), exist_ok=True)
    one = delete_groups[0] if delete_groups and len(delete_groups) == 1 else None
    payload = json.dumps(
        {
            "version": new_version,
            "parent": expected_version,
            "files": sorted(files),
            "txn_id": txn_id,
            "schema": schema,
            "filesets": filesets,
            # per-file footer stats (sources/skipping.py): {rel_path →
            # {"n_rows", "cols": {col → {"min","max","nulls"} | None}}}
            "stats": stats,
            # merge-on-read equality deletes, one group per delete key:
            # [{"key": col, "files": [...]}] — excluded at read time
            # (read_path.read_table).  The legacy single-key mirror
            # fields are kept for pre-r7 manifest readers.
            "delete_groups": delete_groups,
            "deletes": one["files"] if one else None,
            "delete_key": one["key"] if one else None,
            # positional deletes (Iceberg-v2's second delete-file kind):
            # parquet files of (file: rel path, pos: row index) excluded
            # at read time (read_path.read_table / delete_where)
            "pos_deletes": pos_deletes,
        }
    )
    path = _manifest_path(table, new_version)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError as ex:
        raise ConcurrentCommitError(
            f"version {new_version} of {table!r} was committed concurrently"
        ) from ex
    try:
        os.write(fd, payload.encode())
        os.fsync(fd)
    finally:
        os.close(fd)
    return new_version


def upsert(
    spark: SparkSession,
    table: str,
    batch: DataFrame,
    key_cols: list[str],
    txn_id: str | None = None,
) -> int:
    """Transactional MERGE-by-key: rows matching on ``key_cols`` are
    replaced, others inserted — the manifest-backed version of
    ``streaming/sinks.upsert_batch``.  With ``txn_id`` set, a replay of
    an already-committed transaction is a no-op (foreachBatch's
    at-least-once becomes effectively-once).  Returns the table version
    after the call."""
    v = current_version(table)
    if txn_id is not None and _txn_committed(table, v, txn_id):
        return v  # replayed commit: already applied (possibly not latest)
    batch = batch.dropDuplicates(key_cols)
    if v > 0:
        existing = snapshot(spark, table, v)
        merged = existing.join(batch.select(*key_cols), key_cols, "left_anti").unionByName(
            batch
        )
    else:
        merged = batch
    files = stage_files(merged, table)
    # the rewrite resolved every fileset into the reader schema and folded
    # deletes in physically — commit ONE fileset under that schema (an
    # evolved table that merely committed files/version would silently
    # lose its reader schema, ADVICE r6)
    schema = read_manifest(table, v).get("schema") if v else None
    return commit(
        table,
        files,
        expected_version=v,
        txn_id=txn_id,
        schema=schema,
        filesets=[{"files": files, "schema": schema}] if schema else None,
    )


def _txn_committed(table: str, latest: int, txn_id: str) -> bool:
    """Whether ``txn_id`` appears ANYWHERE in the retained history — not
    just the latest manifest: a replayed batch whose original commit has
    since been followed by other writers must still be recognized (the
    real formats keep exactly this per-application transaction history)."""
    for v in range(latest, 0, -1):
        path = _manifest_path(table, v)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            if json.load(f).get("txn_id") == txn_id:
                return True
    return False


def expire_snapshots(table: str, keep_last: int = 1) -> list[int]:
    """Retention: delete manifests older than the newest ``keep_last``
    versions (the Iceberg expire-snapshots / Delta VACUUM-retention
    story).  Data files only those manifests referenced become orphans —
    a following :func:`vacuum` reclaims them, since it unions references
    over the manifests that still EXIST.  Time travel to expired
    versions then fails loudly (missing manifest).

    Caveat carried over from the real formats: the per-application txn
    history lives in the manifests, so retention must exceed any
    streaming source's replay window — expiring a snapshot whose txn_id
    a replayed batch would present makes that replay re-apply
    (:func:`_txn_committed` scans only retained manifests).  Returns the
    expired version numbers."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the current snapshot stays)")
    v = current_version(table)
    expired = []
    for u in range(1, max(v - keep_last + 1, 1)):
        path = _manifest_path(table, u)
        if os.path.exists(path):
            os.remove(path)
            expired.append(u)
    return expired


def vacuum(table: str) -> list[str]:
    """Delete data files no manifest references (crashed writers' staged
    orphans, superseded snapshots' files if old manifests are pruned —
    here every manifest is retained, so 'referenced' = union over ALL
    versions, preserving time travel).  Returns what was removed."""
    referenced: set[str] = set()
    for v in range(1, current_version(table) + 1):
        path = _manifest_path(table, v)
        if os.path.exists(path):
            with open(path) as f:
                m = json.load(f)
            referenced.update(m["files"])
            for g in delete_groups(m):
                referenced.update(g["files"])
            referenced.update(m.get("pos_deletes") or [])
    removed: list[str] = []
    data_root = os.path.join(table, _DATA_DIR)
    for dirpath, _dirs, names in os.walk(data_root):
        for name in names:
            full = os.path.join(dirpath, name)
            rel = os.path.relpath(full, table)
            if name.endswith(".parquet") and rel not in referenced:
                os.remove(full)
                removed.append(rel)
    return removed


def start_manifest_upsert_sink(
    stream: DataFrame,
    table: str,
    key_cols: list[str],
    checkpoint: str | None = None,
):
    """The keyed-upsert streaming sink over the manifest table: same
    ``foreachBatch`` wiring as ``sinks.start_upsert_sink``, but each
    micro-batch commits transactionally with ``txn_id=batch-{epoch}`` —
    a replayed epoch is detected in the manifest and skipped.  A
    concurrent writer (e.g. a ``compact_table`` run) losing the O_EXCL
    race raises ``ConcurrentCommitError`` inside ``upsert``; the batch
    retries against the re-read snapshot (``upsert`` re-reads
    ``current_version`` on every attempt) rather than failing the
    stream permanently."""

    def _upsert_with_retry(batch: DataFrame, epoch: int) -> None:
        last: ConcurrentCommitError | None = None
        for _ in range(5):
            try:
                upsert(
                    batch.sparkSession, table, batch, key_cols,
                    txn_id=f"batch-{epoch}",
                )
                return
            except ConcurrentCommitError as e:  # loser re-reads + re-merges
                last = e
        raise last

    writer = stream.writeStream.outputMode("update").foreachBatch(_upsert_with_retry)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.trigger(availableNow=True).start()


# ---------------------------------------------------------------------------
# registered time-travel query: the snapshot/commit protocol under the
# driver's oracle gate
# ---------------------------------------------------------------------------

_ASOF_TABLES: dict[str, str] = {}


def _asof_table(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per sf_dir) a two-snapshot manifest table
    from ``orders``: v1 inserts every o_orderkey % 3 == 0 row; v2 upserts
    the % 3 == 1 rows (inserts) plus the % 6 == 0 rows with o_totalprice
    bumped by 1000 (updates) — so v1 and v2 differ in BOTH membership and
    values, and an AS-OF read must resolve the v1 manifest, not the
    current one."""
    from pyspark.sql import functions as F

    from ..sources.registry import load_table

    t = _ASOF_TABLES.get(sf_dir)
    if t and os.path.isdir(os.path.join(t, _MANIFEST_DIR)):
        return t
    import tempfile

    t = tempfile.mkdtemp(prefix="anglerfish_asof_")
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_totalprice", "o_orderpriority"]
    base = orders.where(F.col("o_orderkey") % 3 == 0).select(*cols)
    upsert(spark, t, base, ["o_orderkey"], txn_id="asof-v1")
    updates = (
        orders.where(F.col("o_orderkey") % 6 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") + F.lit(1000.0)).alias("o_totalprice"),
            "o_orderpriority",
        )
        .unionByName(orders.where(F.col("o_orderkey") % 3 == 1).select(*cols))
    )
    upsert(spark, t, updates, ["o_orderkey"], txn_id="asof-v2")
    _ASOF_TABLES[sf_dir] = t
    return t


@query(
    "q_table_asof",
    oracle=f"""
SELECT 1 AS version,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {{dsum}} AS total_price
FROM (SELECT o_totalprice AS p FROM orders WHERE o_orderkey % 3 = 0)
UNION ALL
SELECT 2,
       CAST(COUNT(*) AS BIGINT),
       {{dsum}}
FROM (
  SELECT CASE WHEN o_orderkey % 6 = 0 THEN o_totalprice + 1000.0
              ELSE o_totalprice END AS p
  FROM orders WHERE o_orderkey % 3 IN (0, 1)
)
ORDER BY version
""".format(dsum="CAST(CAST(SUM(CAST(p AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"),
    group="sources",
)
def q_table_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the manifest-committed table: summarize snapshot
    v1 AS OF its manifest and the current snapshot (v2) side by side —
    membership AND values must come from the version's own manifest
    (half of v1's rows were value-bumped in v2, a third of v2's rows
    don't exist in v1), so a reader that lists the data directory
    instead of resolving manifests cannot pass.

    The build (once per process) exercises the real protocol: two
    transactional upserts with txn ids, O_EXCL manifest commits, staged
    files invisible until named.  Reads are ordinary parquet scans of
    exactly the files each manifest names — at 100 TB this is the
    entire point of the format: snapshot isolation without touching or
    re-listing the data lake (SCALE.md; sources/manifest_table.py
    design note).
    """
    prepare(spark)
    from pyspark.sql import functions as F

    from ..operators.common import dsum

    t = _asof_table(spark, sf_dir)

    def summarize(version: int) -> DataFrame:
        return snapshot(spark, t, version).agg(
            F.lit(version).alias("version"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )

    return summarize(1).unionByName(summarize(2)).orderBy("version")


def compact_table(
    spark: SparkSession,
    table: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """OPTIMIZE-style file compaction: rewrite the CURRENT snapshot's
    data into ceil(total_bytes / target) bin-packed files and commit the
    result as a new snapshot — logically a no-op (same rows), physically
    the small-files fix every streamed-into table eventually needs (each
    micro-batch upsert stages one file set at source parallelism; at
    100 TB the target is sized so one file ≈ one comfortable scan task).

    Same protocol as every other write: staged files are invisible until
    the O_EXCL manifest commit, concurrent writers conflict on the
    version and retry, and time travel still resolves the pre-compaction
    manifests (whose files remain referenced, so ``vacuum`` keeps them
    while history is retained).  Returns the committed version.

    Reads through the composed path, so compacting a schema-EVOLVED
    table resolves every fileset into the reader schema (the rewrite is
    physical evolution: the committed snapshot is one fileset under the
    reader schema, not a mixed-schema mergeSchema-less read — ADVICE
    r6), and active merge-on-read deletes fold in physically (the new
    manifest carries none).  Per-file stats are NOT carried over (they
    describe the old files); re-stat with ``zorder_compact`` or
    ``commit_with_stats`` when pruning matters."""
    v = current_version(table)
    snap = snapshot(spark, table, v)
    m = read_manifest(table, v)
    total_bytes = sum(
        os.path.getsize(os.path.join(table, f))
        for f in m["files"]
        if os.path.exists(os.path.join(table, f))
    )
    n_files = max(1, -(-total_bytes // target_file_bytes))
    files = stage_files(snap.coalesce(n_files), table)
    schema = m.get("schema")
    return commit(
        table,
        files,
        expected_version=v,
        txn_id=f"compact-v{v}",
        schema=schema,
        filesets=[{"files": files, "schema": schema}] if schema else None,
    )


# ---------------------------------------------------------------------------
# schema evolution: append-only commits + reads resolved through the
# engine's OWN Avro schema resolution (VERDICT r5 #4 — the codec core
# tied to the table layer)
# ---------------------------------------------------------------------------


def append_evolved(
    spark: SparkSession,
    table: str,
    batch: DataFrame,
    writer_schema: str,
    reader_schema: str | None = None,
    txn_id: str | None = None,
    stat_cols: list[str] | None = None,
) -> int:
    """Append ``batch`` (written under ``writer_schema``) WITHOUT
    rewriting existing data, committing ``reader_schema`` (default: the
    writer schema) as the snapshot's read schema.  Prior filesets carry
    over verbatim with their own writer schemas — an ADD COLUMN /
    RENAME-via-alias evolution costs one manifest write, zero data
    rewrites, the whole point of the format at 100 TB.

    The new reader schema must be able to read EVERY retained fileset's
    writer schema (checked via the engine's ``can_read``); an
    incompatible evolution fails the commit, not some later read.

    ``stat_cols`` (writer-schema column names) records footer stats for
    the NEW files; prior files' stats carry forward under their own
    writer-era names — the composed read path re-keys predicates per
    fileset (read_path._writer_predicates), so pruning survives renames."""
    from ..errors import SchemaEvolutionError
    from ..sources.schema_registry import can_read

    reader_schema = reader_schema or writer_schema
    v = current_version(table)
    m = read_manifest(table, v) if v else {"files": [], "filesets": None}
    prior = m.get("filesets") or (
        [{"files": m["files"], "schema": m.get("schema") or writer_schema}]
        if m["files"]
        else []
    )
    for fs in prior:
        reasons = can_read(fs["schema"], reader_schema)
        if reasons:
            raise SchemaEvolutionError(
                f"new reader schema cannot read retained fileset: {reasons}"
            )
    files = stage_files(batch, table)
    stats = m.get("stats")
    if stat_cols:
        from .skipping import collect_file_stats

        stats = {**(stats or {}), **collect_file_stats(table, files, stat_cols)}
    filesets = prior + [{"files": files, "schema": writer_schema}]
    all_files = [f for fs in filesets for f in fs["files"]]
    return commit(
        table,
        all_files,
        expected_version=v,
        txn_id=txn_id,
        schema=reader_schema,
        filesets=filesets,
        stats=stats,
        # active merge-on-read deletes carry forward with the retained
        # filesets — dropping them would resurrect deleted rows
        delete_groups=delete_groups(m) or None,
        pos_deletes=m.get("pos_deletes"),
    )


def snapshot_evolved(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    reader_schema: str | None = None,
) -> DataFrame:
    """Read a snapshot with schema resolution: every fileset's files are
    scanned under the schema they were WRITTEN with, then projected into
    the snapshot's (or caller's) reader schema by the engine's own
    resolution — rename via aliases, defaulted new columns, numeric
    promotions (codec/evolve.evolve_struct; the reference's
    ResolvingDecoder role, AvroJsonFAlgebras.scala schema-resolution
    rules applied column-wise).

    The per-fileset scan stays an ordinary parquet scan (pushdown and
    pruning intact); the projection is a zero-shuffle column map, so
    evolution costs nothing at read time beyond the union.

    Delegates to the composed read path, so active merge-on-read deletes
    apply too (pre-r7 this read path skipped them — ADVICE r6: the two
    read paths disagreed on the same version)."""
    from .read_path import read_table

    df, _report = read_table(spark, table, version, reader_schema=reader_schema)
    return df


_EVOLVED_TABLES: dict[str, str] = {}

_ORDERS_V1_SCHEMA = """
{"type":"record","name":"orders_snap","fields":[
  {"name":"o_orderkey","type":"long"},
  {"name":"total","type":"double"}
]}
"""

#: v2 evolves v1: `total` renamed to `price` via alias, `status` added
#: with a default — v1-era files resolve through BOTH rules at read time
_ORDERS_V2_SCHEMA = """
{"type":"record","name":"orders_snap","fields":[
  {"name":"o_orderkey","type":"long"},
  {"name":"price","type":"double","aliases":["total"]},
  {"name":"status","type":"string","default":"legacy"}
]}
"""


def _evolved_table(spark: SparkSession, sf_dir: str) -> str:
    """Two-snapshot evolved table (once per process per sf_dir): v1
    inserts o_orderkey % 4 == 0 rows under the v1 schema (total, no
    status); v2 APPENDS o_orderkey % 4 == 1 rows written under the v2
    schema (price = o_totalprice + 500, status='live') and commits the
    v2 reader schema — v1's files are retained byte-for-byte."""
    from pyspark.sql import functions as F

    from ..sources.registry import load_table

    t = _EVOLVED_TABLES.get(sf_dir)
    if t and os.path.isdir(os.path.join(t, _MANIFEST_DIR)):
        return t
    import tempfile

    t = tempfile.mkdtemp(prefix="anglerfish_evolved_")
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.where(F.col("o_orderkey") % 4 == 0).select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        F.col("o_totalprice").cast("double").alias("total"),
    )
    append_evolved(spark, t, v1, _ORDERS_V1_SCHEMA, txn_id="evolved-v1")
    v2 = orders.where(F.col("o_orderkey") % 4 == 1).select(
        F.col("o_orderkey").cast("long").alias("o_orderkey"),
        (F.col("o_totalprice") + 500.0).cast("double").alias("price"),
        F.lit("live").alias("status"),
    )
    append_evolved(
        spark, t, v2, _ORDERS_V2_SCHEMA, reader_schema=_ORDERS_V2_SCHEMA,
        txn_id="evolved-v2",
    )
    _EVOLVED_TABLES[sf_dir] = t
    return t


_DSUM_SQL = "CAST(CAST(SUM(CAST({x} AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"


@query(
    "q_table_evolved",
    oracle=f"""
SELECT 'legacy' AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {_DSUM_SQL.format(x='o_totalprice')} AS amount
FROM orders WHERE o_orderkey % 4 = 0
UNION ALL
SELECT 'live',
       CAST(COUNT(*) AS BIGINT),
       {_DSUM_SQL.format(x='o_totalprice + 500.0')}
FROM orders WHERE o_orderkey % 4 = 1
UNION ALL
SELECT 'v1_schema',
       CAST(COUNT(*) AS BIGINT),
       {_DSUM_SQL.format(x='o_totalprice')}
FROM orders WHERE o_orderkey % 4 = 0
ORDER BY bucket
""",
    group="sources",
)
def q_table_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution through the manifest table, resolved by the
    ENGINE's own Avro schema resolution (codec/evolve.evolve_struct +
    schema_registry.can_read — the reference's resolution rules,
    AvroSchemaCompanion semantics per SURVEY §2.1 S3/I7): v2 renames
    ``total``→``price`` via an alias and adds a defaulted ``status``
    column; v1's data files are NEVER rewritten.

    The current read only passes if BOTH rules fire on the v1 fileset —
    the 'legacy' bucket exists solely via default fill, and its amounts
    arrive through the alias rename; the 'v1_schema' row proves time
    travel still reads v1 under v1's own (narrower) schema.  Values
    differ per bucket (v2 rows are +500), so a reader that ignores
    per-fileset writer schemas or rewrites history cannot match.

    Scale shape: evolution costs one manifest write (zero data moved);
    reads stay plain parquet scans + a column-map projection per
    fileset (no shuffle, pushdown intact) — the Iceberg/Delta
    ADD COLUMN story implemented on the engine's own codec."""
    prepare(spark)
    from pyspark.sql import functions as F

    from ..operators.common import dsum

    t = _evolved_table(spark, sf_dir)
    cur = snapshot_evolved(spark, t)  # v2 reader schema
    by_status = cur.groupBy(F.col("status").alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        dsum(F.col("price")).alias("amount"),
    )
    v1 = snapshot_evolved(spark, t, version=1).agg(
        F.lit("v1_schema").alias("bucket"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        dsum(F.col("total")).alias("amount"),
    )
    return by_status.unionByName(v1).orderBy("bucket")


# ---------------------------------------------------------------------------
# merge-on-read equality deletes (the Iceberg v2 delete-file design in
# miniature): a delete costs O(|deleted keys|), never a table rewrite
# ---------------------------------------------------------------------------


def delete_keys(
    spark: SparkSession,
    table: str,
    key_col: str,
    keys: DataFrame,
    txn_id: str | None = None,
) -> int:
    """Transactional DELETE by key, merge-on-read: stage ``keys`` (a
    one-column DataFrame of ``key_col`` values) as an equality-delete
    file and commit a manifest whose DATA files are untouched — readers
    apply the delete as an anti-join (:func:`snapshot`), and
    :func:`compact_table` later folds it in physically (copy-on-write),
    clearing the delete list.

    This is the at-scale delete path: a GDPR-style erasure over a 100 TB
    table writes kilobytes (the keys) instead of rewriting every file
    that contains one matching row.  Repeated deletes accumulate files,
    grouped per delete key (equality-delete schemas are per-file in the
    real format — since r7 a table carries any number of keys, one
    anti-join per key at read time, VERDICT r6 #7).  Time travel is
    preserved: prior manifests don't reference the new delete file, so
    pre-delete versions still read the rows."""
    v = current_version(table)
    if txn_id is not None and _txn_committed(table, v, txn_id):
        return v
    m = read_manifest(table, v)
    if not m["files"]:
        raise FileNotFoundError(f"manifest table {table!r} has no committed snapshot")
    dfiles = stage_files(keys.select(key_col).dropDuplicates(), table)
    groups = [dict(g) for g in delete_groups(m)]
    mine = next((g for g in groups if g["key"] == key_col), None)
    if mine is None:
        groups.append({"key": key_col, "files": dfiles})
    else:
        mine["files"] = list(mine["files"]) + dfiles
    return commit(
        table,
        m["files"],
        expected_version=v,
        txn_id=txn_id,
        schema=m.get("schema"),
        filesets=m.get("filesets"),
        stats=m.get("stats"),
        delete_groups=groups,
        pos_deletes=m.get("pos_deletes"),
    )


def delete_where(
    spark: SparkSession,
    table: str,
    predicate,
    txn_id: str | None = None,
) -> int:
    """Predicate-based merge-on-read DELETE via POSITIONAL delete files —
    the second delete-file kind of the Iceberg v2 design (equality
    deletes key whole values; positional deletes pin (file, row_index)
    pairs).  The predicate is evaluated against the fully-resolved
    current snapshot (evolution + active deletes applied — you delete
    from what you can read), the matching rows' physical positions come
    from Spark's ``_metadata.row_index``, and the commit records them as
    a parquet file of ``(file, pos)`` — data files untouched.

    This is the shape a DELETE FROM … WHERE … compiles to at 100 TB:
    one scan to find positions (prunable/pushed-down like any filtered
    scan), a delete file proportional to the MATCHED rows, zero
    rewrites.  Readers anti-join on (file, pos) — broadcast-sized until
    compaction folds the delete in physically."""
    from pyspark.sql import functions as F

    from .read_path import read_table

    v = current_version(table)
    if txn_id is not None and _txn_committed(table, v, txn_id):
        return v
    m = read_manifest(table, v)
    if not m["files"]:
        raise FileNotFoundError(f"manifest table {table!r} has no committed snapshot")
    df, _report = read_table(spark, table, v, with_positions=True)
    hits = df.where(predicate).select(
        F.col("_fp").alias("file"), F.col("_ri").alias("pos")
    )
    dfiles = stage_files(hits, table)
    return commit(
        table,
        m["files"],
        expected_version=v,
        txn_id=txn_id,
        schema=m.get("schema"),
        filesets=m.get("filesets"),
        stats=m.get("stats"),
        delete_groups=delete_groups(m) or None,
        pos_deletes=(m.get("pos_deletes") or []) + dfiles,
    )


_POSDEL_TABLES: dict[str, str] = {}

#: the predicate threshold both engines apply (absolute: the TPC-H-ish
#: o_totalprice domain is sf-independent)
_POSDEL_PRICE = 200_000.0

_POSDEL_DSUM = (
    "CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
)


def _posdel_table(spark: SparkSession, sf_dir: str) -> str:
    """Two-snapshot positional-delete demo over ``orders`` (once per
    process per sf_dir): v1 inserts the %3==0 keys; v2 runs
    ``delete_where(o_totalprice > _POSDEL_PRICE)`` — a predicate DELETE
    recorded as (file, row_index) pairs, data files untouched."""
    t = _POSDEL_TABLES.get(sf_dir)
    if t and os.path.isdir(os.path.join(t, _MANIFEST_DIR)):
        return t
    import tempfile

    from ..sources.registry import load_table

    t = tempfile.mkdtemp(prefix="anglerfish_posdel_")
    orders = load_table(spark, sf_dir, "orders")
    base = orders.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    upsert(spark, t, base, ["o_orderkey"], txn_id="posdel-v1")
    delete_where(
        spark, t, F.col("o_totalprice") > _POSDEL_PRICE, txn_id="posdel-v2"
    )
    _POSDEL_TABLES[sf_dir] = t
    return t


@query(
    "q_table_delete_where",
    oracle=f"""
SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows, {_POSDEL_DSUM} AS total
FROM orders WHERE o_orderkey % 3 = 0
UNION ALL
SELECT 2, CAST(COUNT(*) AS BIGINT), {_POSDEL_DSUM}
FROM orders WHERE o_orderkey % 3 = 0 AND o_totalprice <= {_POSDEL_PRICE}
ORDER BY version
""",
    group="sources",
)
def q_table_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate DELETE via POSITIONAL delete files (the Iceberg-v2
    second delete kind; :func:`delete_where`): v2 removes every row
    with ``o_totalprice > {_POSDEL_PRICE:,.0f}`` by recording (file,
    row_index) pairs from ``_metadata.row_index`` — the data files stay
    byte-identical (asserted in tests), time travel to v1 still reads
    the full set, and the v2 read anti-joins positions out.  The oracle
    recomputes both versions from ``orders``, so a reader that ignores
    position files (v2 too big), misaligns row indexes (wrong rows
    vanish), or rewrites history (v1 too small) cannot pass.

    Scale shape in :func:`delete_where`: one prunable scan finds the
    positions, the commit is O(matched rows), readers pay one broadcast
    anti-join until compaction folds it in.
    """
    prepare(spark)
    from ..operators.common import dsum

    t = _posdel_table(spark, sf_dir)

    def summarize(version: int) -> DataFrame:
        return snapshot(spark, t, version).agg(
            F.lit(version).alias("version"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            dsum(F.col("o_totalprice")).alias("total"),
        )

    return summarize(1).unionByName(summarize(2)).orderBy("version")


_DELETE_TABLES: dict[str, str] = {}


def _deletes_table(spark: SparkSession, sf_dir: str) -> str:
    """Three-snapshot delete demo over ``orders`` (once per process per
    sf_dir): v1 inserts keys %3 ∈ {0, 1}; v2 equality-deletes the
    %6 == 1 keys (merge-on-read: data files untouched — asserted in
    tests); v3 compacts (copy-on-write: deletes folded in, delete list
    cleared)."""
    t = _DELETE_TABLES.get(sf_dir)
    if t and os.path.isdir(os.path.join(t, _MANIFEST_DIR)):
        return t
    import tempfile

    from ..sources.registry import load_table

    t = tempfile.mkdtemp(prefix="anglerfish_mor_")
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    base = orders.where(k % 3 < 2).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    upsert(spark, t, base, ["o_orderkey"], txn_id="mor-v1")
    doomed = orders.where(k % 6 == 1).select("o_orderkey")
    delete_keys(spark, t, "o_orderkey", doomed, txn_id="mor-v2")
    compact_table(spark, t)
    _DELETE_TABLES[sf_dir] = t
    return t


_MOR_DSUM = "CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"


@query(
    "q_table_deletes",
    oracle=f"""
SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows, {_MOR_DSUM} AS total
FROM orders WHERE o_orderkey % 3 < 2
UNION ALL
SELECT 2, CAST(COUNT(*) AS BIGINT), {_MOR_DSUM}
FROM orders WHERE o_orderkey % 3 < 2 AND o_orderkey % 6 <> 1
UNION ALL
SELECT 3, CAST(COUNT(*) AS BIGINT), {_MOR_DSUM}
FROM orders WHERE o_orderkey % 3 < 2 AND o_orderkey % 6 <> 1
ORDER BY version
""",
    group="sources",
)
def q_table_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE through the manifest table: v2 removes a
    third of v1's keys via an equality-delete file (data files
    byte-identical to v1's — the delete costs O(keys)); v3 is the
    copy-on-write compaction that folds the delete in physically.  The
    v2 and v3 reads must agree with each other AND with the oracle's
    recomputation, while time travel to v1 still sees the deleted rows —
    so a reader that ignores delete files (v2 too big), applies them to
    history (v1 too small), or loses rows in compaction (v3 wrong)
    cannot pass.

    Scale rationale in :func:`delete_keys`; the read-side cost model in
    :func:`snapshot` (broadcast anti-join until compaction).
    """
    prepare(spark)
    from ..operators.common import dsum

    t = _deletes_table(spark, sf_dir)

    def summarize(version: int) -> DataFrame:
        return snapshot(spark, t, version).agg(
            F.lit(version).alias("version"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            dsum(F.col("o_totalprice")).alias("total"),
        )

    return (
        summarize(1)
        .unionByName(summarize(2))
        .unionByName(summarize(3))
        .orderBy("version")
    )
