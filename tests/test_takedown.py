"""CDC-driven index takedowns (operators/takedown.py, VERDICT r10 #1):
deleted docs stop matching in incremental dedup and persisted BM25, the
BM25 statistics corrections are EXACT (not stale), maintenance cost is
batch-sized, and the probe plans keep their scale shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from anglerfish_spark.operators.takedown import _takedown_assets
from anglerfish_spark.operators.text import (
    _bm25_from_persisted,
    _invidx_side_names,
    build_persisted_index,
    invidx_tombstone_table,
)
from anglerfish_spark.sources.manifest_table import snapshot


def _assets(spark, sf_dir):
    t, inv = _takedown_assets(spark, sf_dir)
    ts = spark.table(invidx_tombstone_table(inv)).select("doc_id")
    return t, inv, ts


class TestTakedownCorrectness:
    def test_retired_docs_never_match_and_hits_shrink(self, spark, sf_dir):
        from anglerfish_spark.operators.dedup import dedup_index_tables, lsh_bands
        from anglerfish_spark.operators.text import tokens
        from anglerfish_spark.sources.registry import load_table

        t, inv, ts = _assets(spark, sf_dir)
        docs = load_table(spark, sf_dir, "documents", fanout=True)
        fp = F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(tokens()))).cast("binary")
        )
        new_fps = docs.where(F.col("doc_id") % 10 == 0).select("doc_id", fp.alias("fp"))
        fp_t, band_t = dedup_index_tables(spark, sf_dir)

        def hits(retired: bool) -> tuple[set, set]:
            idx = spark.table(fp_t)
            bidx = spark.table(band_t)
            if retired:
                idx = idx.join(F.broadcast(ts), "doc_id", "left_anti")
                bidx = bidx.join(F.broadcast(ts), "doc_id", "left_anti")
            e = {
                r.doc_id
                for r in new_fps.join(idx.select("fp"), "fp", "left_semi")
                .select("doc_id").distinct().collect()
            }
            bn = lsh_bands(docs).where(F.col("doc_id") % 10 == 0)
            n = {
                r.doc_id
                for r in bn.join(
                    bidx.select("band_id", "band_key"), ["band_id", "band_key"], "left_semi"
                ).select("doc_id").distinct().collect()
            }
            return e, n

        e0, n0 = hits(False)
        e1, n1 = hits(True)
        assert e1 <= e0 and n1 <= n0
        # the takedown demo must actually FLIP at least one probe doc —
        # otherwise the query would pass with a broken retirement
        assert (e0 - e1) or (n0 - n1), "no probe doc depended on a retired doc"

    def test_bm25_statistics_exact_not_stale(self, spark, sf_dir):
        """The retired index's BM25 must equal a FRESH index built over
        the live corpus — score-exact, proving the negative-fragment df
        correction and the negative consts row (a tombstone-only design
        ranks with stale collection statistics and fails here)."""
        t, inv, ts = _assets(spark, sf_dir)
        got = [
            (r.rank, r.doc_id, r.score)
            for r in _bm25_from_persisted(spark, inv, tombstones=ts).collect()
        ]
        ref_name = f"{inv}_ref"
        build_persisted_index(spark, snapshot(spark, t), ref_name)
        want = [
            (r.rank, r.doc_id, r.score)
            for r in _bm25_from_persisted(spark, ref_name).collect()
        ]
        assert got == want
        # and no tombstoned doc appears in the ranking
        dead = {r.doc_id for r in ts.collect()}
        assert not dead & {d for _, d, _ in got}


class TestTakedownMaintenanceShape:
    def test_writes_are_batch_sized_and_consts_sum_to_live(self, spark, sf_dir):
        t, inv, ts = _assets(spark, sf_dir)
        live = snapshot(spark, t)
        n_live = live.count()
        n_dead = ts.count()
        assert n_dead > 0
        # tombstones: exactly the deleted keys
        head = {r.doc_id for r in live.select("doc_id").collect()}
        dead = {r.doc_id for r in ts.collect()}
        assert not head & dead
        # consts rows SUM to the live collection stats (negative row)
        _dl, cs = _invidx_side_names(inv)
        s = spark.table(cs).agg(
            F.sum("n_docs").alias("n"), F.sum("total_len").alias("tl")
        ).first()
        assert s.n == n_live
        from anglerfish_spark.operators.text import tokens

        assert s.tl == live.select(
            F.sum(F.size(tokens())).cast("bigint").alias("t")
        ).first().t
        # negative fragments carry empty postings (pure df correction)
        neg = spark.table(inv).where(F.col("df") < 0)
        assert neg.count() > 0
        assert neg.where(F.size("postings") != 0).count() == 0


class TestTakedownPlans:
    def test_bm25_probe_reads_no_corpus_and_broadcasts_tombstones(self, spark, sf_dir):
        t, inv, ts = _assets(spark, sf_dir)
        df = _bm25_from_persisted(spark, inv, tombstones=ts)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "documents.parquet" not in plan, plan  # never rescans the corpus
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
        assert "SortMergeJoin" not in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
