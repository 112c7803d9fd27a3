"""Metadata inspection surface (sources/metadata.py): DESCRIBE HISTORY
operation labels + exact change counts, the distributed .files table,
and the clustering-restores-COW lifecycle of q_table_clustered."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from anglerfish_spark.sources.manifest_table import (
    commit,
    compact_table,
    current_version,
    delete_where,
    read_manifest,
    snapshot,
    stage_files,
    upsert,
)
from anglerfish_spark.sources.merge import merge_into
from anglerfish_spark.sources.metadata import table_files, table_history


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


class TestTableHistory:
    def test_operations_and_counts(self, spark, tmp_path):
        t = str(tmp_path / "t")
        upsert(spark, t, _df(spark, [(i, "a") for i in range(10)]), ["k"])
        # upsert over half the keys: 5 updates = 5 del + 5 ins images
        upsert(spark, t, _df(spark, [(i, "b") for i in range(5)]), ["k"])
        delete_where(spark, t, F.col("k") >= 8)
        compact_table(spark, t)
        h = {r["version"]: r for r in table_history(spark, t).collect()}
        assert [h[v]["operation"] for v in (1, 2, 3, 4)] == [
            "append", "merge", "delete", "optimize",
        ]
        assert (h[1]["n_inserted"], h[1]["n_deleted"]) == (10, 0)
        assert (h[2]["n_inserted"], h[2]["n_deleted"]) == (5, 5)
        assert (h[3]["n_inserted"], h[3]["n_deleted"]) == (0, 2)
        assert (h[4]["n_inserted"], h[4]["n_deleted"]) == (0, 0)
        assert h[4]["txn_id"].startswith("compact-")

    def test_unrecorded_changes_are_minus_one_not_zero(self, spark, tmp_path):
        t = str(tmp_path / "t")
        upsert(spark, t, _df(spark, [(1, "a")]), ["k"])
        m = read_manifest(t, 1)
        commit(t, m["files"], expected_version=1, changes=None)
        h = {r["version"]: r for r in table_history(spark, t).collect()}
        assert h[2]["operation"] == "write"
        assert (h[2]["n_inserted"], h[2]["n_deleted"]) == (-1, -1)

    def test_insert_only_merge_is_append(self, spark, tmp_path):
        t = str(tmp_path / "t")
        upsert(spark, t, _df(spark, [(1, "a")]), ["k"])
        merge_into(
            spark, t, _df(spark, [(2, "b")]), ["k"],
            when_matched_update={"v": "s.v"}, insert_not_matched=True,
        )
        h = {r["version"]: r for r in table_history(spark, t).collect()}
        # no matched row -> pure insert; the label follows the facts
        assert h[2]["operation"] == "append"
        assert (h[2]["n_inserted"], h[2]["n_deleted"]) == (1, 0)


class TestTableFiles:
    def test_matches_manifest_and_snapshot(self, spark, tmp_path):
        t = str(tmp_path / "t")
        upsert(spark, t, _df(spark, [(i, "a") for i in range(100)]).repartition(4), ["k"])
        upsert(spark, t, _df(spark, [(i, "b") for i in range(100, 120)]), ["k"])
        tf = table_files(spark, t).collect()
        m = read_manifest(t, current_version(t))
        assert sorted(r["file"] for r in tf) == sorted(m["files"])
        assert sum(r["n_rows"] for r in tf) == snapshot(spark, t).count()
        assert all(r["bytes"] > 0 for r in tf)
        assert all(r["partition"] == [] for r in tf)  # unpartitioned

    def test_partitioned_files_carry_tuples_and_spec(self, spark, tmp_path):
        from anglerfish_spark.sources.partitioning import (
            append_partitioned,
            stage_files_partitioned,
        )

        t = str(tmp_path / "t")
        df = _df(spark, [(i, "ab"[i % 2]) for i in range(40)])
        files, parts, spec = stage_files_partitioned(
            spark, df, t, [{"transform": "identity", "col": "v"}]
        )
        commit(t, files, expected_version=0, partition_spec=spec, partitions=parts)
        append_partitioned(spark, t, _df(spark, [(100, "c")]))
        tf = table_files(spark, t).collect()
        assert {tuple(r["partition"]) for r in tf} == {("a",), ("b",), ("c",)}
        assert all(r["spec_id"] == 0 for r in tf)

    def test_time_travel_version(self, spark, tmp_path):
        t = str(tmp_path / "t")
        upsert(spark, t, _df(spark, [(1, "a")]), ["k"])
        upsert(spark, t, _df(spark, [(2, "b")]), ["k"])
        v1 = {r["file"] for r in table_files(spark, t, version=1).collect()}
        assert v1 == set(read_manifest(t, 1)["files"])


class TestClusteredLifecycle:
    def test_routing_flips_after_zorder(self, spark, sf_dir):
        """The q_table_clustered story, pinned physically: the hash-layout
        merge must have routed MERGE-ON-READ (positional deletes, original
        files intact), the post-zorder merge must have routed COW (no new
        delete state) touching a minority of files."""
        from anglerfish_spark.sources.merge import _clustered_demo_table

        t = _clustered_demo_table(spark, sf_dir)
        m1 = read_manifest(t, 1)
        m2 = read_manifest(t, 2)
        m3 = read_manifest(t, 3)
        m4 = read_manifest(t, 4)
        # v2 = MoR: delete state appears, every v1 file carried verbatim
        assert m2.get("pos_deletes")
        assert set(m1["files"]) <= set(m2["files"])
        # v3 = zorder optimize: delete state folded
        assert not m3.get("pos_deletes")
        # v4 = COW: no delete state, and a MINORITY of v3's files rewritten
        assert not m4.get("pos_deletes")
        carried = set(m3["files"]) & set(m4["files"])
        touched = len(m3["files"]) - len(carried)
        assert touched <= len(m3["files"]) // 2, (touched, len(m3["files"]))
        # carried files are byte-identical on disk (never restaged)
        for f in sorted(carried)[:3]:
            assert os.path.exists(os.path.join(t, f))


class TestHistoryScaleShape:
    """r11 (VERDICT r10 #4): commit stamps the change log's row counts
    into the manifest list, so DESCRIBE HISTORY is a pure list-parse."""

    def test_history_opens_zero_parquet_footers(self, spark, tmp_path, monkeypatch):
        t = str(tmp_path / "t")
        upsert(spark, t, _df(spark, [(i, "a") for i in range(8)]), ["k"])
        upsert(spark, t, _df(spark, [(i, "b") for i in range(4)]), ["k"])
        delete_where(spark, t, F.col("k") >= 6)
        import anglerfish_spark.sources.metadata as md

        def boom(*a, **k):
            raise AssertionError("history must not read parquet footers")

        monkeypatch.setattr(md, "_rows_in", boom)
        h = {r["version"]: r for r in table_history(spark, t).collect()}
        assert (h[1]["n_inserted"], h[1]["n_deleted"]) == (8, 0)
        assert (h[2]["n_inserted"], h[2]["n_deleted"]) == (4, 4)
        assert (h[3]["n_inserted"], h[3]["n_deleted"]) == (0, 2)
        assert [h[v]["operation"] for v in (1, 2, 3)] == ["append", "merge", "delete"]

    def test_legacy_missing_change_file_surfaces_sentinel(self, spark, tmp_path):
        """ADVICE r10 #2: a legacy (unstamped) commit whose recorded
        change file is ABSENT must report (-1, -1) 'write', not an
        undercount that mislabels the operation."""
        import json

        from anglerfish_spark.sources.manifest_table import _manifest_path

        t = str(tmp_path / "t")
        upsert(spark, t, _df(spark, [(i, "a") for i in range(6)]), ["k"])
        upsert(spark, t, _df(spark, [(i, "b") for i in range(3)]), ["k"])
        # simulate a pre-r11 manifest: drop the stamped counts, then lose
        # one of the recorded delete-image files
        p = _manifest_path(t, 2)
        with open(p) as f:
            m = json.load(f)
        m["changes"].pop("n_inserted"), m["changes"].pop("n_deleted")
        victim = m["changes"]["deleted"][0]["files"][0]
        with open(p, "w") as f:
            json.dump(m, f)
        os.remove(os.path.join(t, victim))
        h = {r["version"]: r for r in table_history(spark, t).collect()}
        assert (h[2]["n_inserted"], h[2]["n_deleted"]) == (-1, -1)
        assert h[2]["operation"] == "write"
