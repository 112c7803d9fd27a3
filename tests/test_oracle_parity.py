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


def test_windowed_oracles_deterministic_under_ties():
    """Regression for the sf0.5 soak finding: a DuckDB oracle whose window
    ORDER BY is not a total order is permuted arbitrarily *per window
    instance*, so two-stage windows (session flag -> cumulative sum) can
    disagree with themselves run-to-run once timestamps are duplicated.
    The q_session oracle must be stable over a duplicate-heavy relation."""
    import duckdb

    qd = QUERIES["q_session"]
    # 5 exact replicas of every (user_id, ts) -- the scale_soak.py shape
    # that exposed the original instability (DuckDB threads>1 so parallel
    # window evaluation gets a chance to permute ties differently).
    seen = None
    for _ in range(5):
        con = duckdb.connect()
        con.execute("SET threads TO 8")
        # 20k base events x 5 replicas: measured as the smallest shape where
        # the pre-fix oracle (no event_id tiebreak) flakes reliably — below
        # ~10k rows per thread DuckDB's window evaluation keeps a stable
        # tie order and the old bug hides.
        con.execute(
            """
            CREATE VIEW events AS
            SELECT (r * 1000000 + e.event_id) AS event_id, e.user_id, e.ts,
                   e.event_type, e.value
            FROM (SELECT (s % 200) AS user_id,
                         TIMESTAMP '2024-01-01 00:00:00'
                           + INTERVAL (1) MINUTE * ((s * 7919) % 50000) AS ts,
                         'c' AS event_type, 0.5 AS value, s AS event_id
                  FROM generate_series(0, 19999) t(s)) e
            CROSS JOIN generate_series(0, 4) rep(r)
            """
        )
        rows = sorted(map(tuple, con.execute(qd.oracle).fetchall()))
        con.close()
        if seen is None:
            seen = rows
        assert rows == seen
