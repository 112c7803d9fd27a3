"""End-to-end oracle parity for every registered query (driver-gate replica).

Parametrized over the full registry: any query with an oracle must match
DuckDB exactly at sf0.001; oracle-less queries must at least run and
return a stable schema.
"""

from __future__ import annotations

import pytest

from anglerfish_spark.registry import all_queries

from .oracle_harness import compare, duckdb_conn

QUERIES = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    qd = QUERIES[name]
    df = qd.fn(spark, sf_dir)
    if qd.oracle is None:
        rows = df.collect()
        assert df.schema is not None
        assert rows is not None  # rows-only check (driver's weaker gate)
        return
    ok, msg = compare(df, con, qd.oracle)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) > 0


def test_oracle_keys_subset():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) > 0
