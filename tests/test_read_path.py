"""The composed table read path (VERDICT r6 #1 / ADVICE r6): schema
evolution × merge-on-read deletes × stats pruning must read correctly in
EVERY pairwise combination and all together — round 6 shipped them as
three separate read functions that silently mis-read when combined
(snapshot_evolved resurrected deleted rows; scan_pruned ignored both
evolution and deletes; compact_table mixed writer schemas in one read).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import anglerfish_spark.sources.manifest_table as mt
from anglerfish_spark.sources.read_path import read_table
from anglerfish_spark.sources.skipping import scan_pruned, zorder_compact

V1 = """
{"type":"record","name":"t","fields":[
  {"name":"k","type":"long"},
  {"name":"total","type":"double"}
]}
"""
V2 = """
{"type":"record","name":"t","fields":[
  {"name":"k","type":"long"},
  {"name":"price","type":"double","aliases":["total"]},
  {"name":"status","type":"string","default":"legacy"}
]}
"""


def _mk_evolved(spark, tmp_path, stat_cols=False):
    """v1 fileset: k 0..7, total = k*10 (4 range-clustered files);
    v2 fileset: k 8..11, price = k*10 + 5, status='live' (2 files)."""
    t = str(tmp_path / "t")
    v1 = (
        spark.range(0, 8)
        .select(F.col("id").alias("k"), (F.col("id") * 10.0).alias("total"))
        .repartitionByRange(4, "total")
    )
    mt.append_evolved(
        spark, t, v1, V1, stat_cols=["k", "total"] if stat_cols else None
    )
    v2 = spark.range(8, 12).select(
        F.col("id").alias("k"),
        (F.col("id") * 10.0 + 5).alias("price"),
        F.lit("live").alias("status"),
    ).repartitionByRange(2, "price")
    mt.append_evolved(
        spark, t, v2, V2, reader_schema=V2,
        stat_cols=["k", "price"] if stat_cols else None,
    )
    return t


class TestEvolutionPlusDeletes:
    def test_evolved_read_applies_deletes(self, spark, tmp_path):
        """ADVICE r6 medium #1: snapshot_evolved must apply deletes."""
        t = _mk_evolved(spark, tmp_path)
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(2,), (9,)], "k long"))
        got = sorted(r.k for r in mt.snapshot_evolved(spark, t).collect())
        assert got == [0, 1, 3, 4, 5, 6, 7, 8, 10, 11]
        # the two read paths agree on the same version
        assert got == sorted(r.k for r in mt.snapshot(spark, t).collect())

    def test_delete_key_survives_rename_evolution(self, spark, tmp_path):
        """A delete committed on `total` BEFORE the rename must still
        remove rows after the reader schema calls the column `price`."""
        t = str(tmp_path / "t")
        v1 = spark.range(0, 8).select(
            F.col("id").alias("k"), (F.col("id") * 10.0).alias("total")
        )
        mt.append_evolved(spark, t, v1, V1)
        mt.delete_keys(
            spark, t, "total", spark.createDataFrame([(30.0,)], "total double")
        )
        v2 = spark.range(8, 10).select(
            F.col("id").alias("k"),
            (F.col("id") * 10.0 + 5).alias("price"),
            F.lit("live").alias("status"),
        )
        mt.append_evolved(spark, t, v2, V2, reader_schema=V2)
        rows = {r.k: r.price for r in mt.snapshot_evolved(spark, t).collect()}
        assert 3 not in rows  # total=30.0 deleted, applied through the rename
        assert rows[4] == 40.0 and rows[8] == 85.0

    def test_deletes_on_multiple_keys_with_evolution(self, spark, tmp_path):
        t = _mk_evolved(spark, tmp_path)
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(2,)], "k long"))
        mt.delete_keys(
            spark, t, "price", spark.createDataFrame([(85.0,)], "price double")
        )
        got = sorted(r.k for r in mt.snapshot_evolved(spark, t).collect())
        assert got == [0, 1, 3, 4, 5, 6, 7, 9, 10, 11]  # k=2 and price=85 (k=8)


class TestPruningPlusDeletes:
    def test_scan_pruned_applies_deletes(self, spark, tmp_path):
        """ADVICE r6 medium #2: a pruned scan must not resurrect rows."""
        from anglerfish_spark.sources.skipping import commit_with_stats

        t = str(tmp_path / "t")
        df = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).repartitionByRange(4, "k")
        files = mt.stage_files(df, t)
        commit_with_stats(spark, t, files, ["k"], expected_version=0)
        mt.delete_keys(
            spark, t, "k", spark.range(0, 100, 10).select(F.col("id").alias("k"))
        )
        pruned, report = scan_pruned(spark, t, {"k": (0, 49)})
        got = sorted(r.k for r in pruned.collect())
        assert got == [k for k in range(50) if k % 10 != 0]
        assert report["files_kept"] < report["files_total"]  # still prunes


class TestEvolutionPlusPruning:
    def test_predicate_rekeyed_through_rename(self, spark, tmp_path):
        """Stats of v1 files are keyed by v1 names ('total'); a predicate
        on the READER name ('price') must re-key per fileset — pruning
        v1 files correctly instead of keeping (or worse, dropping) all."""
        t = _mk_evolved(spark, tmp_path, stat_cols=True)
        df, report = read_table(spark, t, predicates={"price": (0.0, 35.0)})
        assert sorted(r.k for r in df.collect()) == [0, 1, 2, 3]
        # v1 contributes 4 range-clustered files on total∈[0,70]; the
        # window [0,35] keeps ~2; both v2 files (price>=85) are pruned
        assert report["files_kept"] < report["files_total"]

    def test_predicate_on_defaulted_column_keeps_files(self, spark, tmp_path):
        """v1's writer schema lacks `status` entirely — no stats, files
        conservatively kept, the residual filter evaluates the default."""
        t = _mk_evolved(spark, tmp_path, stat_cols=True)
        df, _ = read_table(spark, t, predicates={"status": ("legacy", "legacy")})
        assert sorted(r.k for r in df.collect()) == list(range(8))


class TestAllThreeComposed:
    def test_evolution_deletes_pruning_together(self, spark, tmp_path):
        t = _mk_evolved(spark, tmp_path, stat_cols=True)
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(2,), (9,)], "k long"))
        mt.delete_keys(
            spark, t, "price", spark.createDataFrame([(30.0,)], "price double")
        )
        df, report = read_table(spark, t, predicates={"price": (0.0, 75.0)})
        assert sorted((r.k, r.price, r.status) for r in df.collect()) == [
            (0, 0.0, "legacy"), (1, 10.0, "legacy"), (4, 40.0, "legacy"),
            (5, 50.0, "legacy"), (6, 60.0, "legacy"), (7, 70.0, "legacy"),
        ]
        assert report["files_kept"] < report["files_total"]
        # time travel to the pre-delete version still sees everything
        assert len(mt.snapshot_evolved(spark, t, version=2).collect()) == 12


class TestRewritesPreserveSchema:
    def test_compact_evolved_table(self, spark, tmp_path):
        """ADVICE r6 low: compaction must resolve filesets through the
        reader schema and re-commit it — not mix writer schemas in one
        read and drop the schema from the manifest."""
        t = _mk_evolved(spark, tmp_path)
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(2,)], "k long"))
        before = sorted(tuple(r) for r in mt.snapshot_evolved(spark, t).collect())
        v = mt.compact_table(spark, t)
        m = mt.read_manifest(t, v)
        assert m["schema"] is not None and len(m["filesets"]) == 1
        assert not mt.delete_groups(m)  # folded in physically
        after = sorted(tuple(r) for r in mt.snapshot_evolved(spark, t).collect())
        assert after == before

    def test_upsert_evolved_table_keeps_schema(self, spark, tmp_path):
        t = _mk_evolved(spark, tmp_path)
        batch = spark.createDataFrame([(100, 1.0, "live")], "k long, price double, status string")
        mt.upsert(spark, t, batch, ["k"])
        m = mt.read_manifest(t)
        assert m["schema"] is not None
        rows = {r.k: r.status for r in mt.snapshot_evolved(spark, t).collect()}
        assert rows[100] == "live" and rows[0] == "legacy"

    def test_zorder_evolved_table_keeps_schema(self, spark, tmp_path):
        t = _mk_evolved(spark, tmp_path)
        v = zorder_compact(spark, t, ["k", "price"], n_files=2)
        m = mt.read_manifest(t, v)
        assert m["schema"] is not None
        df, report = read_table(spark, t, predicates={"price": (0.0, 35.0)})
        assert sorted(r.k for r in df.collect()) == [0, 1, 2, 3]


class TestDeleteKeyDropped:
    def test_reader_without_delete_key_raises(self, spark, tmp_path):
        """A caller-supplied reader schema that drops the delete-key
        column cannot apply the delete — loud error, not silent rows."""
        t = _mk_evolved(spark, tmp_path)
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(2,)], "k long"))
        no_k = """
        {"type":"record","name":"t","fields":[
          {"name":"price","type":"double","aliases":["total"]}
        ]}
        """
        with pytest.raises(ValueError, match="delete group"):
            read_table(spark, t, reader_schema=no_k)[0].collect()


class TestPositionalDeletes:
    """delete_where: predicate DELETE via (file, row_index) positional
    delete files — data untouched, time travel intact, composes with
    equality deletes + evolution, compaction folds everything."""

    def test_positions_not_rewrite(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.range(20).select(F.col("id").alias("k"), (F.col("id") * 10.0).alias("v"))
        mt.upsert(spark, t, df, ["k"], txn_id="v1")
        v = mt.delete_where(spark, t, F.col("v") > 120.0, txn_id="v2")
        m = mt.read_manifest(t, v)
        assert m["files"] == mt.read_manifest(t, 1)["files"]  # untouched
        assert m["pos_deletes"]
        assert sorted(r.k for r in mt.snapshot(spark, t).collect()) == list(range(13))
        assert len(mt.snapshot(spark, t, 1).collect()) == 20  # time travel
        # replay is a no-op
        assert mt.delete_where(spark, t, F.col("v") > 120.0, txn_id="v2") == v

    def test_composes_with_equality_deletes_and_compaction(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.range(20).select(F.col("id").alias("k"), (F.col("id") * 10.0).alias("v"))
        mt.upsert(spark, t, df, ["k"])
        mt.delete_where(spark, t, F.col("v") > 120.0)
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(5,)], "k long"))
        expect = [k for k in range(13) if k != 5]
        assert sorted(r.k for r in mt.snapshot(spark, t).collect()) == expect
        mt.compact_table(spark, t)
        m = mt.read_manifest(t)
        assert not m.get("pos_deletes") and not mt.delete_groups(m)
        assert sorted(r.k for r in mt.snapshot(spark, t).collect()) == expect
        assert mt.vacuum(t) == []  # delete files stay referenced by history

    def test_delete_where_on_evolved_table(self, spark, tmp_path):
        """The predicate evaluates on the RESOLVED rows (reader names),
        while the positions pin physical (file, row) in writer-era files
        — both filesets must honor the delete."""
        t = _mk_evolved(spark, tmp_path)
        mt.delete_where(spark, t, F.col("price") > 50.0)  # v1 rows 6,7; all v2
        got = sorted(r.k for r in mt.snapshot_evolved(spark, t).collect())
        assert got == [0, 1, 2, 3, 4, 5]
        assert len(mt.snapshot_evolved(spark, t, version=2).collect()) == 12

    def test_pruned_scan_applies_positions(self, spark, tmp_path):
        from anglerfish_spark.sources.skipping import commit_with_stats

        t = str(tmp_path / "t")
        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
        ).repartitionByRange(4, "k")
        files = mt.stage_files(df, t)
        commit_with_stats(spark, t, files, ["k"], expected_version=0)
        mt.delete_where(spark, t, F.col("k") % 10 == 0)
        pruned, report = scan_pruned(spark, t, {"k": (0, 49)})
        assert sorted(r.k for r in pruned.collect()) == [
            k for k in range(50) if k % 10 != 0
        ]
        assert report["files_kept"] < report["files_total"]


class TestTableChanges:
    """Change-feed producer: commit-time LOGGED path for every commit
    kind (VERDICT r7 #1), incremental path for append-only history,
    exceptAll diff as the legacy fallback AND the independent oracle the
    logged path is pinned against."""

    def test_append_history_offers_logged_and_incremental(self, spark, tmp_path):
        from anglerfish_spark.sources.read_path import table_changes

        t = _mk_evolved(spark, tmp_path)  # v2 is an append_evolved commit
        expect = [
            (8, 85.0, "live", "insert"), (9, 95.0, "live", "insert"),
            (10, 105.0, "live", "insert"), (11, 115.0, "live", "insert"),
        ]
        feed, mode = table_changes(spark, t, from_version=1, to_version=2)
        assert mode == "logged"  # appends log their new files as the feed
        assert sorted(tuple(r) for r in feed.collect()) == expect
        feed, mode = table_changes(
            spark, t, from_version=1, to_version=2, mode="incremental"
        )
        assert mode == "incremental"
        assert sorted(tuple(r) for r in feed.collect()) == expect

    def test_upsert_rewrite_takes_logged_path(self, spark, tmp_path):
        """The r7 cost cliff: an upsert REWRITE previously forced an
        O(both snapshots) diff; the commit-time log makes it O(changed
        rows) — and the logged feed must equal the diff oracle."""
        from anglerfish_spark.sources.read_path import table_changes

        t = str(tmp_path / "t")
        mt.upsert(spark, t, spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "k long, v double"), ["k"])
        mt.upsert(spark, t, spark.createDataFrame(
            [(2, 99.0), (3, 30.0)], "k long, v double"), ["k"])
        feed, mode = table_changes(spark, t, from_version=1)
        assert mode == "logged"
        rows = sorted((r.k, r.v, r._change_type) for r in feed.collect())
        # update of k=2 = delete old image + insert new; k=3 inserted
        assert rows == [
            (2, 20.0, "delete"), (2, 99.0, "insert"), (3, 30.0, "insert"),
        ]
        diff, mode = table_changes(spark, t, from_version=1, mode="diff")
        assert mode == "diff"
        assert rows == sorted((r.k, r.v, r._change_type) for r in diff.collect())

    def test_noop_update_not_fed(self, spark, tmp_path):
        """Re-upserting an identical row is a physical rewrite but a
        logical no-op — the logged feed must cancel it (like the diff)."""
        from anglerfish_spark.sources.read_path import table_changes

        t = str(tmp_path / "t")
        mt.upsert(spark, t, spark.createDataFrame(
            [(1, 10.0), (2, 20.0)], "k long, v double"), ["k"])
        mt.upsert(spark, t, spark.createDataFrame(
            [(1, 10.0), (2, 21.0)], "k long, v double"), ["k"])
        feed, mode = table_changes(spark, t, from_version=1)
        assert mode == "logged"
        assert sorted((r.k, r.v, r._change_type) for r in feed.collect()) == [
            (2, 20.0, "delete"), (2, 21.0, "insert"),
        ]

    def test_delete_commits_feed_and_compaction_noop(self, spark, tmp_path):
        """Delete-only commits: the feed is the logged deleted images —
        O(deleted rows), for both equality and positional deletes; a
        compaction logs an explicitly empty change set."""
        from anglerfish_spark.sources.read_path import table_changes

        t = str(tmp_path / "t")
        df = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        mt.upsert(spark, t, df, ["k"])
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(4,), (7,)], "k long"))
        feed, mode = table_changes(spark, t, from_version=1, to_version=2)
        assert mode == "logged"
        assert sorted((r.k, r._change_type) for r in feed.collect()) == [
            (4, "delete"), (7, "delete"),
        ]
        mt.delete_where(spark, t, F.col("v") >= 8.0)  # v3: positional
        feed, mode = table_changes(spark, t, from_version=2, to_version=3)
        assert mode == "logged"
        assert sorted((r.k, r._change_type) for r in feed.collect()) == [
            (8, "delete"), (9, "delete"),
        ]
        mt.compact_table(spark, t)  # v4: logically a no-op
        feed, mode = table_changes(spark, t, from_version=3, to_version=4)
        assert mode == "logged"
        assert feed.count() == 0

    def test_logged_equals_diff_on_mixed_history(self, spark, tmp_path):
        """Every single-step feed across a mixed history (upsert rewrite,
        equality delete, positional delete, compaction, append) must
        match the independent exceptAll diff oracle."""
        from anglerfish_spark.sources.read_path import table_changes

        t = str(tmp_path / "t")
        df = spark.range(12).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        mt.upsert(spark, t, df, ["k"])                                      # v1
        mt.upsert(spark, t, spark.createDataFrame(
            [(3, 99.0), (20, 1.0)], "k long, v double"), ["k"])             # v2
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(5,)], "k long"))  # v3
        mt.delete_where(spark, t, F.col("v") > 9.5)                         # v4
        mt.compact_table(spark, t)                                          # v5
        for u in range(1, 5):
            logged, lm = table_changes(spark, t, u, u + 1)
            diff, dm = table_changes(spark, t, u, u + 1, mode="diff")
            assert lm == "logged" and dm == "diff", (u, lm, dm)
            assert sorted(tuple(r) for r in logged.collect()) == sorted(
                tuple(r) for r in diff.collect()
            ), f"step {u}->{u+1}"

    def test_incremental_refused_with_active_deletes_legacy(self, spark, tmp_path):
        """ADVICE r7 medium #1: an append over ACTIVE delete groups may
        only take the incremental path when sequence numbers prove the
        deletes cannot suppress the appended rows; a legacy manifest
        (seq-less groups) must fall back to diff, not feed rows the
        snapshot excludes."""
        import json

        from anglerfish_spark.sources.read_path import table_changes

        t = _mk_evolved(spark, tmp_path)
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(2,)], "k long"))  # v3
        # strip seqs → legacy manifest shape
        for v in (3,):
            p = mt._manifest_path(t, v)
            m = json.load(open(p))
            for g in m["delete_groups"]:
                g.pop("seq", None)
            m["deletes"], m["delete_key"] = m["delete_groups"][0]["files"], "k"
            json.dump(m, open(p, "w"))
        v4_batch = spark.range(2, 4).select(
            F.col("id").alias("k"),
            (F.col("id") * 10.0 + 5).alias("price"),
            F.lit("re").alias("status"),
        )
        mt.append_evolved(spark, t, v4_batch, V2, reader_schema=V2)  # v4
        # seq-less groups apply to ALL filesets: k=2 is suppressed in the
        # snapshot, so neither the logged claim ("k=2 inserted") nor the
        # incremental path may be offered — auto must fall back to diff
        feed, mode = table_changes(spark, t, 3, 4)
        assert mode == "diff"
        assert sorted((r.k, r._change_type) for r in feed.collect()) == [
            (3, "insert"),
        ]

    def test_incremental_refused_guard(self, spark, tmp_path):
        """Directly: legacy seq-less delete groups + append → auto mode
        avoids 'incremental' (logged is fine: appends log their files)."""
        import json

        from anglerfish_spark.sources.read_path import table_changes

        t = _mk_evolved(spark, tmp_path)
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(2,)], "k long"))
        p = mt._manifest_path(t, 3)
        m = json.load(open(p))
        for g in m["delete_groups"]:
            g.pop("seq", None)
        json.dump(m, open(p, "w"))
        v4 = spark.range(20, 22).select(
            F.col("id").alias("k"),
            (F.col("id") * 10.0).alias("price"),
            F.lit("x").alias("status"),
        )
        mt.append_evolved(spark, t, v4, V2, reader_schema=V2)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="append-only"):
            table_changes(spark, t, 3, 4, mode="incremental")


class TestSequenceRule:
    """ADVICE r7 medium #2: equality deletes apply only to filesets with
    strictly older sequence numbers — re-inserting a deleted key via a
    later append must be visible."""

    def test_reinserted_key_visible(self, spark, tmp_path):
        t = _mk_evolved(spark, tmp_path)
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(2,), (9,)], "k long"))
        assert sorted(r.k for r in mt.snapshot(spark, t).collect()) == [
            0, 1, 3, 4, 5, 6, 7, 8, 10, 11,
        ]
        back = spark.createDataFrame([(2, 25.0, "back")], "k long, price double, status string")
        mt.append_evolved(spark, t, back, V2, reader_schema=V2)
        rows = {r.k: r.status for r in mt.snapshot(spark, t).collect()}
        assert rows[2] == "back"  # new fileset seq > delete seq → visible
        assert 9 not in rows      # old fileset rows stay deleted

    def test_second_delete_applies_to_reinserted(self, spark, tmp_path):
        """A LATER delete (higher seq) on the same key removes the
        re-inserted row too."""
        t = _mk_evolved(spark, tmp_path)
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(2,)], "k long"))
        back = spark.createDataFrame([(2, 25.0, "back")], "k long, price double, status string")
        mt.append_evolved(spark, t, back, V2, reader_schema=V2)
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(2,)], "k long"))
        assert 2 not in {r.k for r in mt.snapshot(spark, t).collect()}
        # multi-group manifest: the lossy legacy mirror must be fenced off
        m = mt.read_manifest(t)
        assert len(mt.delete_groups(m)) == 2
        # format 3 since r10 (manifest list + segments): no mirror fields
        assert m["min_reader_format"] == 3 and "deletes" not in m

    def test_legacy_seqless_group_applies_everywhere(self, spark, tmp_path):
        """Backward compat: a manifest whose delete groups carry no seq
        (pre-r8) keeps its old read semantics — the delete suppresses
        every fileset, including later appends."""
        import json

        t = _mk_evolved(spark, tmp_path)
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(2,)], "k long"))
        p = mt._manifest_path(t, 3)
        m = json.load(open(p))
        for g in m["delete_groups"]:
            g.pop("seq", None)
        json.dump(m, open(p, "w"))
        back = spark.createDataFrame([(2, 25.0, "back")], "k long, price double, status string")
        mt.append_evolved(spark, t, back, V2, reader_schema=V2)
        assert 2 not in {r.k for r in mt.snapshot(spark, t).collect()}


class TestCompactDeletesEvolved:
    """compact_deletes × evolution × sequence rule: the re-appended
    key's (newer) file must NOT be rewritten, and the rewrite resolves
    mixed writer schemas into the reader schema."""

    def test_targeted_with_seq_and_rename(self, spark, tmp_path):
        t = _mk_evolved(spark, tmp_path)                                   # v1, v2
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(2,), (9,)], "k long"))  # v3
        back = spark.createDataFrame(
            [(2, 25.0, "back")], "k long, price double, status string"
        )
        mt.append_evolved(spark, t, back, V2, reader_schema=V2)            # v4
        m4 = mt.read_manifest(t)
        newest_files = set(m4["filesets"][-1]["files"])  # the re-append, seq 4
        expect = sorted(tuple(r) for r in mt.snapshot(spark, t).collect())
        v5, report = mt.compact_deletes(spark, t)
        # the delete (seq 3) cannot apply to the seq-4 fileset: its file
        # is untouched; only files containing k=2 (old image) / k=9 get
        # rewritten
        assert not (set(report["rewritten"]) & newest_files)
        assert report["rewritten"]
        m5 = mt.read_manifest(t)
        assert not mt.delete_groups(m5)
        got = sorted(tuple(r) for r in mt.snapshot(spark, t).collect())
        assert got == expect
        rows = {r.k: r.status for r in mt.snapshot(spark, t).collect()}
        assert rows[2] == "back" and 9 not in rows

    def test_pruned_probe_uses_stats(self, spark, tmp_path):
        """With footer stats recorded, the equality probe's read plans
        prune candidate files by the keys' range (files_kept < total)."""
        t = _mk_evolved(spark, tmp_path, stat_cols=True)
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(1,)], "k long"))
        from anglerfish_spark.sources.read_path import read_table

        # the probe read compact_deletes performs: keys {1} -> lo=hi=1
        pre, report = read_table(
            spark, t, with_positions=True, apply_deletes=False,
            predicates={"k": (1, 1)},
        )
        assert report["files_kept"] < report["files_total"]
        v, rep = mt.compact_deletes(spark, t)
        assert len(rep["rewritten"]) == 1  # exactly the file holding k=1
        got = sorted(r.k for r in mt.snapshot(spark, t).collect())
        assert got == [0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11]


class TestFeedRetentionInterplay:
    """Change feed × expire_snapshots: expiring an INTERMEDIATE manifest
    removes its change log, so the logged path is unavailable — the feed
    must degrade to the endpoint diff (still correct), never fail or
    serve a partial log."""

    def test_expired_intermediate_falls_back_to_diff(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import expire_snapshots
        from anglerfish_spark.sources.read_path import table_changes

        t = str(tmp_path / "t")
        mt.upsert(spark, t, spark.range(6).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")), ["k"])   # v1
        mt.upsert(spark, t, spark.createDataFrame(
            [(2, 22.0)], "k long, v double"), ["k"])                          # v2
        mt.upsert(spark, t, spark.createDataFrame(
            [(7, 70.0)], "k long, v double"), ["k"])                          # v3
        before, _ = table_changes(spark, t, 1, 3, mode="diff")
        want = sorted(tuple(r) for r in before.collect())
        # keep v1 pinned via tag so the diff endpoints survive retention
        mt.tag(t, "from", 1)
        assert expire_snapshots(t, keep_last=1) == [2]
        feed, mode = table_changes(spark, t, 1, 3)
        assert mode == "diff"  # v2's log is gone; logged path must refuse
        assert sorted(tuple(r) for r in feed.collect()) == want


class TestNetFold:
    """table_changes(net=True): endpoint-net folding of the per-commit
    logged feed must equal the two-snapshot diff EXACTLY on a history
    where intermediate events cancel."""

    def test_net_logged_equals_diff(self, spark, tmp_path):
        from anglerfish_spark.sources.read_path import table_changes

        t = str(tmp_path / "t")
        mt.upsert(spark, t, spark.range(6).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")), ["k"])      # v1
        mt.upsert(spark, t, spark.createDataFrame(
            [(9, 90.0)], "k long, v double"), ["k"])                             # v2: insert 9
        mt.delete_keys(spark, t, "k", spark.createDataFrame([(9,), (2,)], "k long"))  # v3: delete it again + 2
        mt.upsert(spark, t, spark.createDataFrame(
            [(2, 2.0)], "k long, v double"), ["k"])                              # v4: 2 back at its ORIGINAL image
        per_commit, m1 = table_changes(spark, t, 1, 4)
        net, m2 = table_changes(spark, t, 1, 4, net=True)
        diff, m3 = table_changes(spark, t, 1, 4, mode="diff")
        assert m1 == m2 == "logged" and m3 == "diff"
        # per-commit: k=9's insert+delete and k=2's delete+reinsert all visible
        pc = sorted(tuple(r) for r in per_commit.collect())
        assert (9, 90.0, "insert") in pc and (9, 90.0, "delete") in pc
        assert (2, 2.0, "delete") in pc and (2, 2.0, "insert") in pc
        # net: they cancel — and equal the endpoint diff exactly (empty here)
        n = sorted(tuple(r) for r in net.collect())
        d = sorted(tuple(r) for r in diff.collect())
        assert n == d == []
