#!/usr/bin/env python
"""Full-registry oracle parity report — the builder's answer to the
driver's 50-query CORRECTNESS sample (which rotates and has historically
left most of the registry unchecked in any given round).

Runs EVERY registered query against its DuckDB oracle at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01 — the driver's
CORRECTNESS scale) with the same compare the driver applies (row count,
column names, exact values after name-sorted columns) and writes one JSON
file mapping query name → {ok, detail}; prints the tally line.

Usage: python parity_report.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from anglerfish_spark.registry import all_queries
    from anglerfish_spark.session import get_spark
    from tests.oracle_harness import duckdb_conn, compare

    out_path = sys.argv[1] if len(sys.argv) > 1 else "PARITY.json"
    spark = get_spark("anglerfish-parity")
    con = duckdb_conn(SF_DIR)
    results: dict[str, dict] = {}
    t0 = time.perf_counter()
    for name, qd in sorted(all_queries().items()):
        if qd.oracle is None:
            results[name] = {"ok": None, "detail": "no oracle (rows-only check)"}
            continue
        try:
            ok, msg = compare(qd.fn(spark, SF_DIR), con, qd.oracle)
        except Exception as exc:  # noqa: BLE001 - report must cover everything
            ok, msg = False, f"{type(exc).__name__}: {exc}"[:300]
        results[name] = {"ok": ok, "detail": None if ok else msg}
    n_ok = sum(1 for r in results.values() if r["ok"])
    n_fail = sum(1 for r in results.values() if r["ok"] is False)
    n_nooracle = sum(1 for r in results.values() if r["ok"] is None)
    payload = {
        "sf_dir": SF_DIR,
        "total": len(results),
        "pass": n_ok,
        "fail": n_fail,
        "no_oracle": n_nooracle,
        "elapsed_sec": round(time.perf_counter() - t0, 1),
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(
        f"parity: {n_ok}/{n_ok + n_fail} pass ({n_nooracle} rows-only) "
        f"at {SF_DIR} -> {out_path}"
    )
    if n_fail:
        for name, r in results.items():
            if r["ok"] is False:
                print(f"  FAIL {name}: {r['detail']}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
