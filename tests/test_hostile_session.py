"""Oracle parity under a hostile host session.

The driver harness owns its own SparkSession; the engine cannot assume
UTC, ANSI mode, or any particular shuffle-partition count.  ``prepare()``
(session.py) pins the semantics that must match the DuckDB oracle; this
test proves the pin works by running representative queries inside a
subprocess whose session is built with deliberately hostile settings —
non-UTC timezone, ANSI off, 7 shuffle partitions (odd, tiny, and different
from the 32 every other test uses) — and asserting exact oracle parity.

Subprocess isolation is required: timezone and shuffle-partition defaults
are baked into the test session at JVM launch, and SPARK_GRAFT_CPUS is
read at module import.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: one query per semantics family that a hostile session could break:
#: decimal aggregation (ANSI), event-time windows + session gaps (timezone),
#: epoch arithmetic over a RANGE frame (timezone), the expression decoder
#: (timezone-sensitive logical types), a hash pipeline (partition count),
#: decimal moments (partition-order determinism).
QUERIES = [
    "q1_pricing_summary",
    "q_session",
    "q_window_range",
    "json_decode_logical",
    "q_dedup_minhash_lsh",
    "q_stats_moments",
]

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[4]")
    .appName("anglerfish-hostile")
    .config("spark.sql.session.timeZone", "US/Pacific")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.shuffle.partitions", "7")
    .config("spark.sql.timeType.enabled", "true")
    .getOrCreate()
)
from anglerfish_spark.registry import all_queries
from tests.oracle_harness import duckdb_conn, compare
sf_dir = {sf_dir!r}
qs = all_queries()
con = duckdb_conn(sf_dir)
failed = []
for name in {queries!r}:
    ok, msg = compare(qs[name].fn(spark, sf_dir), con, qs[name].oracle)
    print(name, "ok" if ok else f"FAIL {{msg}}", flush=True)
    if not ok:
        failed.append(name)
assert not failed, failed
"""


def test_parity_under_hostile_session(sf_dir):
    env = dict(os.environ, SPARK_GRAFT_CPUS="7")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO, sf_dir=sf_dir, queries=QUERIES)],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
