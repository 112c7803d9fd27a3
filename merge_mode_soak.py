#!/usr/bin/env python
"""Random-key MERGE under COW vs MoR at two scales (VERDICT r9 #4
"Done" criterion): a uniform-random key batch defeats the touched-file
probe's min/max box, so COW degrades toward a full rewrite while MoR
stays O(changed rows) — measured as wall time + DATA bytes written per
mode, plus what mode='auto' picks.

Usage: python merge_mode_soak.py [out_json]
Env:   MERGE_SOAK_FILES (default "200,1000")
"""

from __future__ import annotations

import json
import os
import sys
import time


def _data_bytes(table: str) -> int:
    total = 0
    for dirpath, _d, names in os.walk(os.path.join(table, "data")):
        for n in names:
            if n.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dirpath, n))
    return total


def measure(spark, n_files: int, tmp: str) -> dict:
    import warnings

    from pyspark.sql import functions as F

    from anglerfish_spark.sources import manifest_table as mt
    from anglerfish_spark.sources.merge import merge_into

    rows = n_files * 200
    out = {"n_files": n_files, "table_rows": rows}
    # one key per ~2 files, uniformly spread: the probe box covers all
    src_rows = n_files // 2
    for mode in ("cow", "mor", "auto"):
        t = os.path.join(tmp, f"t{n_files}_{mode}")
        df = spark.range(rows).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ).repartitionByRange(n_files, "k")
        mt.upsert(spark, t, df, ["k"])
        base_bytes = _data_bytes(t)
        step = rows // src_rows
        src = spark.range(0, rows, step).select(
            F.col("id").alias("k"), F.lit(-1.0).alias("v")
        )
        t0 = time.time()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            merge_into(
                spark, t, src, ["k"],
                when_matched_update={"v": "s.v"}, insert_not_matched=False,
                mode=mode,
            )
        wall = time.time() - t0
        m = mt.read_manifest(t)
        out[mode] = {
            "merge_wall_sec": round(wall, 2),
            "data_bytes_written": _data_bytes(t) - base_bytes,
            "base_table_bytes": base_bytes,
            "rewrite_fraction": round((_data_bytes(t) - base_bytes) / base_bytes, 4),
            "pos_deletes": bool(m.get("pos_deletes")),
        }
        # correctness spot check
        got = {
            r.k: r.v
            for r in mt.snapshot(spark, t).where(F.col("k") < 3 * step).collect()
        }
        assert got[0] == -1.0 and got[step] == -1.0 and got[1] == 1.0, (mode, got)
    return out


def measure_clustered(spark, n_files: int, tmp: str) -> dict:
    """SCALE.md #46: clustering restores COW-eligibility.  A key-LOCAL
    batch (one contiguous 5% block of the key domain — the "backfill a
    key range" shape) against a HASH-layout table has members in EVERY
    file (auto → MoR); after one ``zorder_compact`` on the key the SAME
    batch touches only the block's ~5% of files (auto → COW, bytes ∝
    batch locality instead of batch cardinality)."""
    import warnings

    from pyspark.sql import functions as F

    from anglerfish_spark.sources import manifest_table as mt
    from anglerfish_spark.sources.merge import merge_into
    from anglerfish_spark.sources.skipping import zorder_compact

    rows = n_files * 200
    t = os.path.join(tmp, f"cl{n_files}")
    df = spark.range(rows).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
    ).repartition(n_files, "k")  # hash layout: every file spans the domain
    mt.upsert(spark, t, df, ["k"])
    out = {"n_files": n_files, "table_rows": rows}

    def local_batch(lo: int) -> "object":
        # one contiguous 5% block of the key domain starting at lo
        return spark.range(lo, lo + rows // 20).select(
            F.col("id").alias("k"), F.lit(-2.0).alias("v")
        )

    for phase, lo in (("hash_layout", 0), ("zordered", rows // 10)):
        if phase == "zordered":
            zorder_compact(spark, t, ["k"], n_files=n_files)
        base_bytes = _data_bytes(t)
        v0 = mt.current_version(t)
        t0 = time.time()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            merge_into(
                spark, t, local_batch(lo), ["k"],
                when_matched_update={"v": "s.v"}, insert_not_matched=False,
                mode="auto",
            )
        wall = time.time() - t0
        m = mt.read_manifest(t)
        prev = mt.read_manifest(t, v0)
        carried = set(prev["files"]) & set(m["files"])
        out[phase] = {
            "merge_wall_sec": round(wall, 2),
            "data_bytes_written": _data_bytes(t) - base_bytes,
            "rewrite_fraction": round((_data_bytes(t) - base_bytes) / base_bytes, 4),
            "files_touched": len(prev["files"]) - len(carried),
            "files_total": len(prev["files"]),
            "routed": "mor" if m.get("pos_deletes") else "cow",
        }
        assert (
            mt.snapshot(spark, t).where(F.col("k") == lo).first().v == -2.0
        ), phase
    return out


def main() -> None:
    import tempfile

    from pyspark.sql import SparkSession

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    tmp = tempfile.mkdtemp(prefix="anglerfish_mergesoak_")
    sizes = [int(x) for x in os.environ.get("MERGE_SOAK_FILES", "200,1000").split(",")]
    payload = {
        "runs": [measure(spark, n, tmp) for n in sizes],
        "clustered": [measure_clustered(spark, n, tmp) for n in sizes],
    }
    print(json.dumps(payload, indent=1))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
