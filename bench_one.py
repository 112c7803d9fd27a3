#!/usr/bin/env python
"""Quiet-session single-query timer: python bench_one.py q1 q2 ... [--runs N]

Measures each named registry query in ISOLATION (fresh plans, same session),
N runs each, printing per-run times + min/median — the root-causing tool the
r4 verdict asked for (BENCH numbers are taken in a 20-query session whose
accumulated state adds one-sided noise)."""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from anglerfish_spark.registry import all_queries
    from anglerfish_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 5
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
    spark = get_spark("anglerfish-bench-one")
    qs = all_queries()
    out = {}
    for name in args:
        fn = qs[name].fn
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = {"runs": ts, "min": min(ts), "median": statistics.median(ts)}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
