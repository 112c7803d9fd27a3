"""Guard against DuckDB aggregate-type widening leaking into oracle output.

DuckDB's ``SUM(BIGINT)`` returns HUGEINT, which exports through Arrow as
``decimal128(38, 0)`` (→ float64 in pandas).  A driver-side comparison that
collects the oracle via Arrow then sees ``2914662.0`` where Spark produced
the int64 ``2914662`` and records a value-hash mismatch even though the
numbers agree (root cause of the round-1 ``q_text_stats`` failure).

This test runs every registered oracle at sf0.001 (DuckDB only — no Spark)
and asserts no output column has an Arrow decimal type: integer aggregates
must carry an explicit outer ``CAST(... AS BIGINT)``.
"""

from __future__ import annotations

import pyarrow as pa
import pytest

from anglerfish_spark.registry import all_queries
from tests.conftest import SF_DIR
from tests.oracle_harness import duckdb_conn


@pytest.fixture(scope="module")
def con():
    return duckdb_conn(SF_DIR)


def _oracle_items():
    return [(n, qd.oracle) for n, qd in all_queries().items() if qd.oracle]


@pytest.mark.parametrize("name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()])
def test_oracle_output_has_no_decimal_columns(con, name, sql):
    table = con.execute(sql).arrow()
    bad = [
        (f.name, str(f.type))
        for f in table.schema
        if pa.types.is_decimal(f.type)
    ]
    assert not bad, (
        f"{name}: oracle output column(s) {bad} export as Arrow decimal "
        "(DuckDB HUGEINT widening) — add an outer CAST(... AS BIGINT)"
    )
