"""Partition-order determinism, enforced.

SCALE.md's determinism contract: results must not depend on how the
input happens to be partitioned — float accumulation order, per-partition
sketch state, and window tie-breaks are the classic leaks.  The engine's
answers are the decimal-accumulate contract (`operators/common.dsum`),
exact integer quantization, and total window orders; this test runs
representative queries over the SAME rows arranged three hostile ways
(a single row group, many tiny row groups, content-rehashed row order)
and asserts results identical to the base sf_dir layout.

The queries load their own tables, so the arrangement is injected by
rewriting the parquet input: each variant directory holds identical rows
in different file/row order.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

QUERIES = [
    "q1_pricing_summary",   # decimal sums
    "q_stats_moments",      # variance/corr from decimal moments
    "q_session",            # session windows + dsum
    "q_dedup_pagerank",     # decimal-exact rank mass over the LSH graph
    "q_heavy_hitters",      # per-partition Misra-Gries candidates + exact verify
    "q_perplexity",         # integer-bits quantization
    "q_curation_full",      # composed dedup stages, order-free relaxations
    # r5 continuation additions
    "q_importance_resampling",   # bucket-model bits + integer threshold
    "q_bloom_decontaminate",     # driver-built bitset + per-doc fp accounting
    "q_pq_codes",                # vectorized fold-order distance + argmin ties
    "q_pattern_match",           # gaps-and-islands over a total event order
    "q_cdc_apply",               # latest-row tombstone apply, event_id ties
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def variant_dirs(sf_dir, tmp_path_factory):
    """Three physical arrangements of the same logical tables."""
    con = duckdb.connect()
    out = []
    for name, clause, row_group in [
        # one giant row group per file — a single Spark input partition
        ("onegroup", "", 1_000_000_000),
        # many tiny row groups — many tiny input partitions
        ("tinygroups", "", 2048),
        # same tiny groups with the rows reordered by a deterministic
        # content hash (row-content order, not storage order)
        ("rehashed", "ORDER BY md5(CAST(t AS VARCHAR)) DESC", 2048),
    ]:
        d = tmp_path_factory.mktemp(f"inv_{name}")
        for t in TABLES:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet') t {clause})"
                f" TO '{d}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {row_group})"
            )
        out.append(str(d))
    return out


def _rows(spark, name, d):
    from anglerfish_spark.registry import all_queries

    df = all_queries()[name].fn(spark, d)
    return sorted(map(str, (tuple(r) for r in df.collect())))


@pytest.mark.parametrize("name", QUERIES)
def test_result_is_partition_arrangement_invariant(name, spark, sf_dir, variant_dirs):
    base = _rows(spark, name, sf_dir)
    for d in variant_dirs:
        assert _rows(spark, name, d) == base, f"{name} differs under {d}"
