"""Query registry — single source of truth for the engine's query surface.

Every operator module registers its runnable queries here with the
``@query`` decorator; ``__spark_entry__`` exposes the aggregate to the
driver (``queries()`` / ``oracle_sql()``), and the local test harness runs
the same pairs against DuckDB at sf0.001.

A registered query is a callable ``(spark, sf_dir) -> DataFrame`` plus an
optional ANSI-SQL oracle string DuckDB can evaluate over the same parquet
tables.  Column names of the DataFrame and the oracle MUST match — the
driver sorts columns by name before value-hashing.

Float determinism contract (used throughout): aggregate doubles by casting
each addend to DECIMAL(38,10) (exact, order-insensitive accumulation), then
cast the final sum to DOUBLE.  Per-row double arithmetic uses identical
expression trees on both sides, so results are bit-identical across engines
regardless of row order or parallelism.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    group: str = ""


QUERIES: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, group: str = "") -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = QueryDef(name, fn, oracle, group)
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    """Import every operator module (triggering registration) and return all."""
    # imports are intentionally local: registration happens on first use and
    # the modules need a working pyspark, which the front-end-only schema
    # tools must not require.
    from .codec import queries as _codec_queries  # noqa: F401
    from .sources import manifest_table as _manifest_table  # noqa: F401
    from .sources import merge as _merge  # noqa: F401
    from .sources import metadata as _metadata  # noqa: F401
    from .sources import wap as _wap  # noqa: F401
    from .sources import ocf_datasource as _ocf_ds  # noqa: F401
    from .sources import partitioning as _partitioning  # noqa: F401
    from .sources import read_path as _read_path  # noqa: F401
    from .sources import skipping as _skipping  # noqa: F401
    from .operators import dedup as _dedup  # noqa: F401
    from .operators import history as _history  # noqa: F401
    from .operators import lm as _lm  # noqa: F401
    from .operators import multimodal as _multimodal  # noqa: F401
    from .operators import packing as _packing  # noqa: F401
    from .operators import profile as _profile  # noqa: F401
    from .operators import relational as _relational  # noqa: F401
    from .operators import relational_ext as _relational_ext  # noqa: F401
    from .operators import similarity as _similarity  # noqa: F401
    from .operators import sketch as _sketch  # noqa: F401
    from .operators import takedown as _takedown  # noqa: F401
    from .operators import text as _text  # noqa: F401
    from .operators import tpch as _tpch  # noqa: F401
    from .streaming import decode as _sdecode  # noqa: F401
    from .streaming import deletes as _sdeletes  # noqa: F401
    from .streaming import mv as _smv  # noqa: F401
    from .streaming import joins as _sjoins  # noqa: F401
    from .streaming import stateful as _stateful  # noqa: F401
    from .streaming import table_feed as _table_feed  # noqa: F401
    from .streaming import windows as _windows  # noqa: F401

    return dict(QUERIES)
