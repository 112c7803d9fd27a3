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
    results = [measure(spark, n, tmp) for n in sizes]
    print(json.dumps({"runs": results}, indent=1))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump({"runs": results}, f, indent=1)


if __name__ == "__main__":
    main()
