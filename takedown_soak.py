#!/usr/bin/env python
"""r11 scale soaks for the two flows whose cost claims are "∝ batch, not
table": CDC-driven index takedowns and reverse-log RESTORE.

1. **Takedown maintenance flat vs index size** (VERDICT r10 #1 "Done"
   criterion): retire the SAME fixed-size deleted batch from a persisted
   inverted index built over 1x and 5x corpora.  Maintenance reads only
   the change-feed images and appends batch-sized artifacts, so wall
   time must stay ~flat while the index grows 5x.

2. **Restore-with-changes flat vs table size** (VERDICT r10 #3 "Done"
   criterion): RESTORE one same-sized upsert commit off tables of N and
   5N rows, with ``record_changes=True`` (the default — the r10 shape
   this replaces paid a two-snapshot ``exceptAll``, 1.79x at 5x data).
   The reverse-log composition reads only the undone commit's change
   files, so wall time must stay ~flat; the O(table) diff fallback is
   measured alongside for contrast.

Usage: python takedown_soak.py [out_json]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
       SPARK_GRAFT_SF_DIR_5X (default /tmp/anglerfish_sf0.5 — generate
       with scale_soak.py first).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_1X = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF_5X = os.environ.get("SPARK_GRAFT_SF_DIR_5X", "/tmp/anglerfish_sf0.5")
BATCH = 64  # fixed takedown-batch size (deletion-request scale)


def _timeit(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 3), out


def takedown_flat(spark) -> dict:
    from pyspark.sql import functions as F

    from anglerfish_spark.operators.text import (
        build_persisted_index,
        inverted_index_takedown,
    )
    from anglerfish_spark.sources.registry import load_table

    out = {}
    for label, sf in (("1x", SF_1X), ("5x", SF_5X)):
        docs = load_table(spark, sf, "documents").select("doc_id", "text")
        n_docs = docs.count()
        name = f"ang_tdnsoak_{label}_{abs(hash(sf)) % 10**8}"
        t_build, _ = _timeit(lambda: build_persisted_index(spark, docs, name))
        # the SAME fixed batch at both scales: smallest BATCH doc_ids
        batch = docs.orderBy("doc_id").limit(BATCH).localCheckpoint(eager=True)
        t_maint, _ = _timeit(
            lambda: inverted_index_takedown(spark, name, batch)
        )
        out[label] = {
            "corpus_docs": n_docs,
            "build_sec": t_build,
            "maintenance_sec": t_maint,
        }
    out["maintenance_ratio_5x_over_1x"] = round(
        out["5x"]["maintenance_sec"] / out["1x"]["maintenance_sec"], 2
    )
    return out


def restore_flat(spark) -> dict:
    from pyspark.sql import functions as F

    from anglerfish_spark.sources import manifest_table as mt

    out = {}
    tmp = tempfile.mkdtemp(prefix="anglerfish_rstsoak_")
    for label, n in (("1x", 200_000), ("5x", 1_000_000)):
        t = os.path.join(tmp, label)
        base = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ).repartitionByRange(16, "k")
        mt.upsert(spark, t, base, ["k"])
        # same-sized undone commit at both scales: 500 keys re-valued
        batch = spark.range(500).select(
            F.col("id").alias("k"), (F.col("id") + 0.5).alias("v")
        )
        mt.upsert(spark, t, batch, ["k"])
        t_logged, v = _timeit(lambda: mt.restore_table(spark, t, 1))
        assert v == 3
        # contrast: the pre-r11 shape (two-snapshot diff) on the same
        # history — force it by restoring across the log-less rebase
        mt.commit(t, mt.read_manifest(t)["files"], expected_version=3, changes=None)
        t_diff, _ = _timeit(lambda: mt.restore_table(spark, t, 2))
        out[label] = {
            "table_rows": n,
            "restore_logged_sec": t_logged,
            "restore_diff_fallback_sec": t_diff,
        }
    out["logged_ratio_5x_over_1x"] = round(
        out["5x"]["restore_logged_sec"] / out["1x"]["restore_logged_sec"], 2
    )
    out["diff_ratio_5x_over_1x"] = round(
        out["5x"]["restore_diff_fallback_sec"] / out["1x"]["restore_diff_fallback_sec"], 2
    )
    return out


def maintenance_scaling_25x(spark) -> dict:
    """r13 (VERDICT r12 #7): the full maintenance lifecycle —
    build / fixed-batch APPEND / fixed-batch TAKEDOWN / COMPACT — at
    1x, 5x, and 25x corpora (25x = the sf0.5 docs replicated 5 times
    with shifted doc_ids, ~125k docs), confirming the O(batch) trends
    hold beyond the 5x points and that compaction grows ~linearly in
    index size (it IS the O(index) fold, by design)."""
    from pyspark.sql import functions as F

    from anglerfish_spark.operators.text import (
        build_persisted_index,
        inverted_index_append,
        inverted_index_compact,
        inverted_index_takedown,
    )
    from anglerfish_spark.sources.registry import load_table

    base5 = load_table(spark, SF_5X, "documents").select("doc_id", "text")
    n5 = base5.count()
    corpora = {
        "1x": load_table(spark, SF_1X, "documents").select("doc_id", "text"),
        "5x": base5,
        "25x": None,  # built below from base5 once n5 is known
    }
    offset = (n5 // 1000 + 2) * 1000 * 10
    rep = None
    for i in range(5):
        part = base5.select(
            (F.col("doc_id") + F.lit(i * offset)).alias("doc_id"), "text"
        )
        rep = part if rep is None else rep.unionByName(part)
    corpora["25x"] = rep

    out = {}
    for label, docs in corpora.items():
        docs = docs.localCheckpoint(eager=True)
        n_docs = docs.count()
        top = docs.agg(F.max("doc_id")).first()[0]
        name = f"ang_mntsoak_{label}_{abs(hash((label, SF_5X))) % 10**8}"
        t_build, _ = _timeit(lambda: build_persisted_index(spark, docs, name))
        # fixed-size NEW batch (ids beyond the corpus), then a
        # fixed-size takedown of existing docs, then the O(index) fold
        newb = (
            docs.orderBy("doc_id").limit(BATCH)
            .select((F.col("doc_id") + F.lit(top + 1)).alias("doc_id"), "text")
            .localCheckpoint(eager=True)
        )
        t_append, _ = _timeit(lambda: inverted_index_append(spark, name, newb))
        batch = docs.orderBy("doc_id").limit(BATCH).localCheckpoint(eager=True)
        t_tdn, _ = _timeit(lambda: inverted_index_takedown(spark, name, batch))
        t_compact, _ = _timeit(lambda: inverted_index_compact(spark, name))
        out[label] = {
            "corpus_docs": n_docs,
            "build_sec": t_build,
            "append_sec": t_append,
            "takedown_sec": t_tdn,
            "compact_sec": t_compact,
        }
    for op in ("append_sec", "takedown_sec"):
        out[f"{op[:-4]}_ratio_25x_over_1x"] = round(
            out["25x"][op] / out["1x"][op], 2
        )
    out["compact_ratio_25x_over_5x"] = round(
        out["25x"]["compact_sec"] / out["5x"]["compact_sec"], 2
    )
    return out


def main() -> None:
    from anglerfish_spark.session import get_spark

    out_path = sys.argv[1] if len(sys.argv) > 1 else "TAKEDOWN_SOAK.json"
    spark = get_spark("anglerfish-takedown-soak")
    payload = {
        "takedown_fixed_batch_vs_index_size": takedown_flat(spark),
        "restore_fixed_changes_vs_table_size": restore_flat(spark),
        "maintenance_scaling_25x": maintenance_scaling_25x(spark),
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
