"""MERGE INTO semantics (sources/merge.py): clause precedence,
change-log exactness (logged == diff, no-op cancellation), ambiguity
detection, empty-table init, and time-travel preservation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anglerfish_spark.errors import AnglerfishError
from anglerfish_spark.localdata import local_df
from anglerfish_spark.sources.manifest_table import current_version, snapshot, upsert
from anglerfish_spark.sources.merge import AmbiguousMergeError, merge_into
from anglerfish_spark.sources.read_path import table_changes


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _base(spark, tmp_path):
    t = str(tmp_path / "t")
    target = local_df(
        spark,
        [(1, 10.0, "keep"), (2, 20.0, "upd"), (3, 30.0, "del"), (4, 40.0, "keep")],
        ["k", "v", "tag"],
    )
    upsert(spark, t, target, ["k"], txn_id="init")
    return t


class TestMergeSemantics:
    def test_three_clause_merge(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        src = local_df(
            spark,
            [(2, 99.0, "src"), (3, 0.0, "src"), (5, 50.0, "new")],
            ["k", "v", "tag"],
        )
        merge_into(
            spark,
            t,
            src,
            ["k"],
            when_matched_update={"v": "s.v"},
            when_matched_delete="t.tag = 'del'",
            insert_not_matched=True,
        )
        # k=1,4 untouched; k=2 updated to 99 (tag stays target's); k=3
        # deleted (delete precedes update); k=5 inserted with source image
        assert _rows(snapshot(spark, t)) == [
            (1, 10.0, "keep"),
            (2, 99.0, "upd"),
            (4, 40.0, "keep"),
            (5, 50.0, "new"),
        ]

    def test_update_expressions_see_both_sides(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        src = local_df(spark, [(2, 5.0, "x")], ["k", "v", "tag"])
        merge_into(
            spark,
            t,
            src,
            ["k"],
            when_matched_update={"v": "t.v + s.v", "tag": "concat(t.tag, '+', s.tag)"},
            insert_not_matched=False,
        )
        got = {r["k"]: (r["v"], r["tag"]) for r in snapshot(spark, t).collect()}
        assert got[2] == (25.0, "upd+x")
        assert got[1] == (10.0, "keep")

    def test_insert_only_merge_skips_matched(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        src = local_df(spark, [(2, 99.0, "x"), (6, 60.0, "new")], ["k", "v", "tag"])
        merge_into(spark, t, src, ["k"], insert_not_matched=True)
        got = _rows(snapshot(spark, t))
        assert (2, 20.0, "upd") in got  # matched row untouched
        assert (6, 60.0, "new") in got

    def test_delete_only_merge(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        src = local_df(spark, [(3, 0.0, "x"), (4, 0.0, "x")], ["k", "v", "tag"])
        merge_into(
            spark,
            t,
            src,
            ["k"],
            when_matched_delete="true",
            insert_not_matched=False,
        )
        assert [r["k"] for r in snapshot(spark, t).orderBy("k").collect()] == [1, 2]

    def test_duplicate_source_keys_raise(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        src = local_df(spark, [(2, 1.0, "a"), (2, 2.0, "b")], ["k", "v", "tag"])
        with pytest.raises(AmbiguousMergeError):
            merge_into(spark, t, src, ["k"], when_matched_update={"v": "s.v"})

    def test_duplicate_unmatched_keys_are_legal_inserts(self, spark, tmp_path):
        """Delta semantics (ADVICE r8 low #1): duplicate source keys that
        match NO target row are a legal insert-only merge — both rows
        insert; only a duplicated MATCHED key is ambiguous."""
        t = _base(spark, tmp_path)
        src = local_df(
            spark, [(7, 1.0, "a"), (7, 2.0, "b"), (2, 99.0, "s")], ["k", "v", "tag"]
        )
        merge_into(spark, t, src, ["k"], when_matched_update={"v": "s.v"})
        got = _rows(snapshot(spark, t))
        assert (7, 1.0, "a") in got and (7, 2.0, "b") in got
        assert (2, 99.0, "upd") in got

    def test_duplicate_null_keys_never_match(self, spark, tmp_path):
        """Multiple null-key source rows match nothing (SQL equality) and
        must not trip the ambiguity guard."""
        t = _base(spark, tmp_path)
        src = local_df(
            spark, [(None, 1.0, "n1"), (None, 2.0, "n2")], ["k", "v", "tag"]
        ).selectExpr("CAST(k AS BIGINT) AS k", "v", "tag")
        merge_into(spark, t, src, ["k"])
        ks = [r["k"] for r in snapshot(spark, t).collect()]
        assert ks.count(None) == 2 and len(ks) == 6

    def test_merge_into_empty_table_inserts_all(self, spark, tmp_path):
        t = str(tmp_path / "empty")
        src = local_df(spark, [(1, 1.0, "a")], ["k", "v", "tag"])
        merge_into(spark, t, src, ["k"])
        assert _rows(snapshot(spark, t)) == [(1, 1.0, "a")]
        with pytest.raises(FileNotFoundError):
            merge_into(
                spark,
                str(tmp_path / "empty2"),
                src,
                ["k"],
                when_matched_delete="true",
                insert_not_matched=False,
            )

    def test_missing_insert_columns_raise(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        src = local_df(spark, [(9, 1.0)], ["k", "v"])
        with pytest.raises(AnglerfishError, match="missing"):
            merge_into(spark, t, src, ["k"], insert_not_matched=True)

    def test_txn_replay_is_noop(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        src = local_df(spark, [(5, 50.0, "new")], ["k", "v", "tag"])
        v1 = merge_into(spark, t, src, ["k"], txn_id="m1")
        v2 = merge_into(spark, t, src, ["k"], txn_id="m1")
        assert v1 == v2 == current_version(t)
        assert sum(r["k"] == 5 for r in snapshot(spark, t).collect()) == 1

    def test_time_travel_preserved(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        src = local_df(spark, [(3, 0.0, "x")], ["k", "v", "tag"])
        merge_into(spark, t, src, ["k"], when_matched_delete="true",
                   insert_not_matched=False)
        assert len(_rows(snapshot(spark, t, 1))) == 4  # pre-merge snapshot intact
        assert len(_rows(snapshot(spark, t, 2))) == 3


class TestMergeChangeLog:
    def test_logged_feed_equals_diff_and_cancels_noops(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        src = local_df(
            spark,
            # k=1: NO-OP update (same image) — must not appear in the feed
            # k=2: real update; k=3: delete; k=5: insert
            [(1, 10.0, "keep"), (2, 99.0, "upd"), (3, 0.0, "x"), (5, 50.0, "new")],
            ["k", "v", "tag"],
        )
        merge_into(
            spark,
            t,
            src,
            ["k"],
            when_matched_update={"v": "s.v"},
            when_matched_delete="t.tag = 'del'",
        )
        logged, mode = table_changes(spark, t, 1, 2, mode="logged")
        assert mode == "logged"
        diff, _ = table_changes(spark, t, 1, 2, mode="diff")
        assert _rows(logged) == _rows(diff)
        evs = {(r["k"], r["_change_type"]) for r in logged.collect()}
        assert evs == {(2, "delete"), (2, "insert"), (3, "delete"), (5, "insert")}


class TestFileTargetedWrites:
    """VERDICT r8 #1/#2: row-level writes are O(touched), not O(table) —
    COW rewrites only the files containing matched keys (every other
    file byte-identical on disk), MoR rewrites nothing at all."""

    def _sizes(self, t, files):
        import os

        return {f: os.path.getsize(os.path.join(t, f)) for f in files}

    def _clustered(self, spark, tmp_path, name="t"):
        """A range-clustered table: 8 files, keys 0..79 in disjoint
        ranges, with footer stats so the probe can prune."""
        from anglerfish_spark.sources.manifest_table import (
            _DATA_DIR,
            commit,
            stage_files,
        )
        from anglerfish_spark.sources.skipping import collect_file_stats

        t = str(tmp_path / name)
        df = spark.range(80).select(
            F.col("id").alias("k"),
            (F.col("id") * 1.0).alias("v"),
            F.lit("base").alias("tag"),
        ).repartitionByRange(8, "k")
        files = stage_files(df, t)
        commit(
            t,
            files,
            expected_version=0,
            stats=collect_file_stats(t, files, ["k"]),
            changes={"inserted": [{"files": files, "schema": None}], "deleted": []},
        )
        return t

    def _merge(self, spark, t, mode):
        src = local_df(
            spark,
            [(72, 720.0, "upd"), (75, 0.0, "del"), (200, 1.0, "new")],
            ["k", "v", "tag"],
        )
        merge_into(
            spark,
            t,
            src,
            ["k"],
            when_matched_update={"v": "s.v"},
            when_matched_delete="s.tag = 'del'",
            mode=mode,
        )

    def _expect(self):
        rows = [(k, float(k), "base") for k in range(80) if k not in (72, 75)]
        rows += [(72, 720.0, "base"), (200, 1.0, "new")]
        return sorted(rows)

    def test_cow_rewrites_only_touched_files(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import read_manifest

        t = self._clustered(spark, tmp_path)
        m1 = read_manifest(t)
        sizes_before = self._sizes(t, m1["files"])
        self._merge(spark, t, "cow")
        m2 = read_manifest(t)
        # the keys 72/75 live in ONE range file: exactly one file dropped,
        # every other original file still referenced with identical bytes
        carried = [f for f in m1["files"] if f in set(m2["files"])]
        assert len(carried) == len(m1["files"]) - 1
        assert self._sizes(t, carried) == {f: sizes_before[f] for f in carried}
        assert _rows(snapshot(spark, t)) == self._expect()
        logged, mode = table_changes(spark, t, 1, 2, mode="logged")
        assert mode == "logged"
        diff, _ = table_changes(spark, t, 1, 2, mode="diff")
        assert _rows(logged) == _rows(diff)

    def test_mor_rewrites_nothing(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import read_manifest

        t = self._clustered(spark, tmp_path)
        m1 = read_manifest(t)
        sizes_before = self._sizes(t, m1["files"])
        self._merge(spark, t, "mor")
        m2 = read_manifest(t)
        # EVERY original file still referenced, byte-identical; matched
        # old rows masked by positional deletes; new images appended
        assert set(m1["files"]) <= set(m2["files"])
        assert self._sizes(t, m1["files"]) == sizes_before
        assert m2.get("pos_deletes")
        assert _rows(snapshot(spark, t)) == self._expect()
        logged, mode = table_changes(spark, t, 1, 2, mode="logged")
        assert mode == "logged"
        diff, _ = table_changes(spark, t, 1, 2, mode="diff")
        assert _rows(logged) == _rows(diff)

    def test_mor_then_compact_folds(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import (
            compact_deletes,
            read_manifest,
        )

        t = self._clustered(spark, tmp_path)
        self._merge(spark, t, "mor")
        v, report = compact_deletes(spark, t)
        m = read_manifest(t)
        assert not m.get("pos_deletes")
        assert report["rewritten"]  # only the pos-deleted file rewrote
        assert _rows(snapshot(spark, t)) == self._expect()

    def test_mor_time_travel_preserved(self, spark, tmp_path):
        t = self._clustered(spark, tmp_path)
        self._merge(spark, t, "mor")
        assert len(_rows(snapshot(spark, t, 1))) == 80  # pre-merge snapshot

    def test_upsert_rewrites_only_touched_files(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import read_manifest

        t = self._clustered(spark, tmp_path)
        m1 = read_manifest(t)
        sizes_before = self._sizes(t, m1["files"])
        batch = local_df(spark, [(72, 720.0, "upd"), (200, 1.0, "new")], ["k", "v", "tag"])
        upsert(spark, t, batch, ["k"])
        m2 = read_manifest(t)
        carried = [f for f in m1["files"] if f in set(m2["files"])]
        assert len(carried) == len(m1["files"]) - 1
        assert self._sizes(t, carried) == {f: sizes_before[f] for f in carried}
        expect = sorted(
            [(k, float(k), "base") for k in range(80) if k != 72]
            + [(72, 720.0, "upd"), (200, 1.0, "new")]
        )
        assert _rows(snapshot(spark, t)) == expect
        logged, mode = table_changes(spark, t, 1, 2, mode="logged")
        assert mode == "logged"
        diff, _ = table_changes(spark, t, 1, 2, mode="diff")
        assert _rows(logged) == _rows(diff)

    def test_mor_equals_cow(self, spark, tmp_path):
        t1 = self._clustered(spark, tmp_path, "cow")
        t2 = self._clustered(spark, tmp_path, "mor")
        self._merge(spark, t1, "cow")
        self._merge(spark, t2, "mor")
        assert _rows(snapshot(spark, t1)) == _rows(snapshot(spark, t2))

    def test_mode_validated(self, spark, tmp_path):
        t = self._clustered(spark, tmp_path)
        src = local_df(spark, [(1, 1.0, "x")], ["k", "v", "tag"])
        with pytest.raises(AnglerfishError, match="mode"):
            merge_into(spark, t, src, ["k"], mode="nope")


class TestConcurrentMerge:
    def test_merge_retry_after_lost_race_sequentializes(self, spark, tmp_path, monkeypatch):
        """A merge that loses the O_EXCL commit race retries against the
        re-read snapshot; the result must equal sequential application of
        the concurrent upsert THEN the merge — including over the key the
        concurrent writer updated (the retried probe/matched join must
        see the NEW image, not the one the first attempt read)."""
        import anglerfish_spark.sources.merge as mg
        from anglerfish_spark.sources.manifest_table import (
            ConcurrentCommitError,
            current_version,
        )

        t = _base(spark, tmp_path)  # keys 1..4 at v1
        real_commit = mg.commit
        state = {"raced": False}

        def racing_commit(table, files, expected_version, **kw):
            if not state["raced"]:
                state["raced"] = True
                # a concurrent writer lands v2 first: k=2 re-priced to 77
                upsert(
                    spark, t,
                    local_df(spark, [(2, 77.0, "upd")], ["k", "v", "tag"]),
                    ["k"], txn_id="racer",
                )
            return real_commit(table, files, expected_version, **kw)

        monkeypatch.setattr(mg, "commit", racing_commit)
        src = local_df(spark, [(2, 99.0, "s"), (5, 50.0, "new")], ["k", "v", "tag"])
        kw = dict(when_matched_update={"v": "s.v"}, insert_not_matched=True)
        with pytest.raises(ConcurrentCommitError):
            merge_into(spark, t, src, ["k"], **kw)
        # retry: merge_into re-reads the current version internally
        merge_into(spark, t, src, ["k"], **kw)
        assert current_version(t) == 3
        got = _rows(snapshot(spark, t))
        assert (2, 99.0, "upd") in got  # merge applied OVER the racer's image
        assert (5, 50.0, "new") in got
        assert len(got) == 5
        # change log of the retried merge is exact vs the racer's snapshot
        logged, mode = table_changes(spark, t, 2, 3, mode="logged")
        assert mode == "logged"
        evs = sorted((r["k"], r["_change_type"]) for r in logged.collect())
        assert evs == [(2, "delete"), (2, "insert"), (5, "insert")]


class TestMorNoEmptyDeleteFiles:
    """ADVICE r9 low: an insert-only (or all-keep) MoR merge must not
    append an empty positional-delete file — every subsequent read would
    pay a useless file read + broadcast anti-join forever."""

    def test_insert_only_mor_stages_no_pos_delete(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import read_manifest

        t = str(tmp_path / "t")
        upsert(spark, t, local_df(spark, [(1, 1.0)], ["k", "v"]), ["k"])
        # source matches nothing: pure insert under MoR
        merge_into(
            spark, t, local_df(spark, [(2, 2.0)], ["k", "v"]), ["k"],
            when_matched_update={"v": "s.v"}, mode="mor",
        )
        m = read_manifest(t)
        assert not m.get("pos_deletes")
        assert sorted(tuple(r) for r in snapshot(spark, t).collect()) == [
            (1, 1.0), (2, 2.0),
        ]

    def test_matched_update_still_stages_pos_delete(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import read_manifest

        t = str(tmp_path / "t")
        upsert(spark, t, local_df(spark, [(1, 1.0)], ["k", "v"]), ["k"])
        merge_into(
            spark, t, local_df(spark, [(1, 9.0)], ["k", "v"]), ["k"],
            when_matched_update={"v": "s.v"}, mode="mor",
        )
        m = read_manifest(t)
        assert m.get("pos_deletes")
        assert sorted(tuple(r) for r in snapshot(spark, t).collect()) == [(1, 9.0)]


class TestNonLeadingKeyChangeLog:
    """Column-order regression (r10): a key column that is NOT the
    table's first column must produce correctly-ordered change images
    (the semi-join reorders keys first; exceptAll is positional)."""

    def test_upsert_on_second_column_logs_exact_feed(self, spark, tmp_path):
        t = str(tmp_path / "t")
        upsert(spark, t, local_df(spark, [(1.0, 10), (2.0, 20)], ["v", "k"]), ["k"])
        upsert(spark, t, local_df(spark, [(5.0, 10), (3.0, 30)], ["v", "k"]), ["k"])
        logged, mode = table_changes(spark, t, 1, 2, mode="logged")
        assert mode == "logged"
        got = sorted(tuple(r) for r in logged.collect())
        assert got == [
            (1.0, 10, "delete"), (3.0, 30, "insert"), (5.0, 10, "insert"),
        ]


class TestAutoModeRouting:
    """VERDICT r9 #4: mode='auto' keeps COW while the touched-file probe
    prunes (clustered keys) and routes to MoR when it cannot (uniform
    keys -> near-full rewrite); explicit cow in that situation warns."""

    def _table(self, spark, tmp_path, name="t"):
        t = str(tmp_path / name)
        df = spark.range(320).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ).repartitionByRange(16, "k")
        upsert(spark, t, df, ["k"])
        return t

    def test_clustered_keys_stay_cow(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import read_manifest

        t = self._table(spark, tmp_path)
        m1 = read_manifest(t)
        src = local_df(spark, [(0, 9.0), (1, 9.0), (2, 9.0)], ["k", "v"])
        merge_into(spark, t, src, ["k"], when_matched_update={"v": "s.v"}, mode="auto")
        m2 = read_manifest(t)
        assert not m2.get("pos_deletes")  # COW path taken
        assert len(set(m1["files"]) & set(m2["files"])) >= len(m1["files"]) - 2

    def test_uniform_keys_route_to_mor(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import read_manifest

        t = self._table(spark, tmp_path)
        m1 = read_manifest(t)
        # one key per file: the stats box covers the whole table
        src = local_df(spark, [(k, 9.0) for k in range(0, 320, 20)], ["k", "v"])
        merge_into(spark, t, src, ["k"], when_matched_update={"v": "s.v"}, mode="auto")
        m2 = read_manifest(t)
        assert m2.get("pos_deletes")  # MoR path taken
        assert set(m1["files"]) <= set(m2["files"])  # nothing rewritten
        got = {r.k: r.v for r in snapshot(spark, t).collect()}
        assert all(got[k] == 9.0 for k in range(0, 320, 20))
        assert got[1] == 1.0

    def test_explicit_cow_on_uniform_keys_warns(self, spark, tmp_path):
        import warnings as _w

        t = self._table(spark, tmp_path)
        src = local_df(spark, [(k, 9.0) for k in range(0, 320, 20)], ["k", "v"])
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            merge_into(spark, t, src, ["k"], when_matched_update={"v": "s.v"}, mode="cow")
        assert any("full table rewrite" in str(w.message) for w in rec)
