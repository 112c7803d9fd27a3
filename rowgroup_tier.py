#!/usr/bin/env python
"""Multi-row-group testdata tier (VERDICT r13 #1).

Every sf0.1 table ships as ONE parquet row group, so a scan plans one
partition per table and the driver's low-core/high-core scaling
comparison measures the scheduling floor, not parallel throughput
(`PERF_r13.json` `suspect_cpus_ignored`).  This script rewrites a
scale-factor directory with the SAME rows in the SAME order, split into
``$SPARK_GRAFT_ROWGROUPS`` (default 32) row groups per table — the
splitting unit of a parquet scan — so map stages can actually use the
cores the bench grants them.

Content-identical by construction: one ``pyarrow.parquet`` read/write
per table, no reordering, the Arrow schema preserved verbatim (this
matters for ``events.ts``, whose physical type differs across testdata
generations).  The DuckDB oracle reads the same rows either way, so
correctness results are unchanged.

Usage::

    python rowgroup_tier.py [out_dir]      # default /tmp/anglerfish_sf_rg
    SPARK_GRAFT_SF_DIR=<out_dir> python bench.py

The scaling-mode run the r13 verdict asked for::

    SPARK_GRAFT_SF_DIR=<out_dir> SPARK_GRAFT_CPUS=8  python bench.py
    SPARK_GRAFT_SF_DIR=<out_dir> SPARK_GRAFT_CPUS=32 python bench.py
"""

from __future__ import annotations

import glob
import os
import sys

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_GROUPS = int(os.environ.get("SPARK_GRAFT_ROWGROUPS", "32"))


def main() -> None:
    import pyarrow.parquet as pq

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/anglerfish_sf_rg"
    os.makedirs(out, exist_ok=True)
    for f in sorted(glob.glob(os.path.join(SRC, "*.parquet"))):
        name = os.path.basename(f)
        t = pq.read_table(f)
        # floor of 64 rows/group keeps broadcast-scale dims (region,
        # nation) in one sane group instead of one group per row
        per_group = max(64, -(-t.num_rows // N_GROUPS))
        dst = os.path.join(out, name)
        pq.write_table(t, dst, row_group_size=per_group)
        print(
            f"{name}: {t.num_rows} rows, "
            f"{pq.ParquetFile(f).num_row_groups} -> "
            f"{pq.ParquetFile(dst).num_row_groups} row groups"
        )
    print(f"tier written to {out}")


if __name__ == "__main__":
    main()
