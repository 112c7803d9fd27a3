"""Unit tests for duplicate-cluster resolution (connected components).

ADVICE r1: the label-propagation loop capped at max_iter=15 silently
returned partial labels on components with diameter > 15.  The fix adds
pointer jumping (O(log diameter) rounds) and raises ConvergenceError
instead of returning partial results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anglerfish_spark.errors import ConvergenceError
from anglerfish_spark.operators.dedup import connected_components


def _path_graph(spark, n: int):
    """Chain 0-1-2-…-(n-1): one component of diameter n-1."""
    return spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )


class TestConnectedComponents:
    def test_long_chain_converges_in_log_rounds(self, spark):
        # diameter 299 — min-label propagation alone needs 299 rounds; with
        # pointer jumping the default max_iter=15 (2^15 reach) is ample
        labels = connected_components(_path_graph(spark, 300), "a", "b")
        rows = labels.collect()
        assert len(rows) == 300
        assert all(r["label"] == 0 for r in rows)

    def test_multiple_components(self, spark):
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)], ["a", "b"]
        )
        labels = {r["node"]: r["label"] for r in connected_components(pairs, "a", "b").collect()}
        assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    def test_nonconvergence_raises(self, spark):
        with pytest.raises(ConvergenceError, match="did not converge"):
            connected_components(_path_graph(spark, 64), "a", "b", max_iter=2)


class TestHeavyHitters:
    """Misra-Gries candidates + exact verify: result must be exact under
    any partitioning (the sketch only bounds the candidate set)."""

    def test_exact_under_adversarial_partitioning(self, spark):
        from pyspark.sql import functions as F

        from anglerfish_spark.operators.sketch import heavy_hitters

        # 'hot' is 2% of tokens but spread thin across 16 partitions, the
        # worst case for a per-partition sketch; filler is near-uniform
        rows = []
        for i in range(4000):
            toks = [f"w{i % 997}", f"w{(i * 7) % 997}", "hot" if i % 25 == 0 else f"w{(i * 13) % 997}"]
            rows.append((" ".join(toks),))
        docs = spark.createDataFrame(rows, ["text"]).repartition(16)
        got = {r["token"]: r["cnt"] for r in heavy_hitters(docs, theta=0.01).collect()}
        assert got == {"hot": 160}  # 4000*3 tokens, hot=160 = 1.33% > 1%

    def test_no_false_positives(self, spark):
        from anglerfish_spark.operators.sketch import heavy_hitters

        docs = spark.createDataFrame(
            [(f"u{i} u{i+1} u{i+2}",) for i in range(1000)], ["text"]
        ).repartition(8)
        assert heavy_hitters(docs, theta=0.01).count() == 0
