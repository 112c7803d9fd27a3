"""Format-3 manifest layout (VERDICT r9 #1, the Iceberg manifest-list
model): per-file metadata lives in content-addressed fileset SEGMENTS;
the version file is a small list.  Pins the three cost-shape claims —
commit metadata payload O(changed filesets) not O(table files), carried
chunks reused byte-for-byte (zero writes), and pruned reads loading only
the segments their predicates keep — plus orphan-segment GC and the
reader-format fence."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from anglerfish_spark.errors import AnglerfishError
from anglerfish_spark.sources import manifest_table as mt
from anglerfish_spark.sources.manifest_table import (
    _MANIFEST_DIR,
    _SEG_DIR,
    commit,
    current_version,
    read_manifest,
    read_manifest_light,
    snapshot,
    stage_files,
    upsert,
    vacuum,
)
from anglerfish_spark.sources.read_path import read_table
from anglerfish_spark.sources.skipping import commit_with_stats


def _seg_paths(table, version):
    m = read_manifest_light(table, version)
    return {ch["path"] for ss in m["segsets"] for ch in ss["chunks"]}


def _meta_bytes(table):
    """Total bytes under _manifests (lists + segments)."""
    out = {}
    for dirpath, _d, names in os.walk(os.path.join(table, _MANIFEST_DIR)):
        for n in names:
            full = os.path.join(dirpath, n)
            out[os.path.relpath(full, table)] = os.path.getsize(full)
    return out


class TestSegmentLayout:
    def _table(self, spark, tmp_path, n=40, chunk_target=4):
        """A table whose single fileset spans many chunks (small target
        so the multi-chunk machinery runs at sandbox scale)."""
        t = str(tmp_path / "t")
        df = spark.range(n).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        ).repartitionByRange(8, "k")
        files = stage_files(df, t)
        return t, files

    def test_roundtrip_reconstructs_classic_shape(self, spark, tmp_path, monkeypatch):
        monkeypatch.setattr(mt, "_SEG_TARGET_FILES", 4)
        t, files = self._table(spark, tmp_path)
        commit_with_stats(spark, t, files, ["k"], expected_version=0, txn_id="v1")
        m = read_manifest(t)
        assert sorted(m["files"]) == sorted(files)
        assert set(m["stats"]) == set(files)
        assert m["min_reader_format"] == 3
        light = read_manifest_light(t)
        assert "files" not in light and len(_seg_paths(t, 1)) >= 2
        assert sorted(r.k for r in snapshot(spark, t).collect()) == list(range(40))

    def test_carried_chunks_reused_and_payload_o_changed(
        self, spark, tmp_path, monkeypatch
    ):
        """A keyed write touching ONE file must reuse every untouched
        chunk (same content-addressed paths, zero new bytes for them):
        the commit's metadata payload is the new fileset's chunks + the
        new change files' nothing + one small list."""
        monkeypatch.setattr(mt, "_SEG_TARGET_FILES", 4)
        t, files = self._table(spark, tmp_path)
        commit_with_stats(spark, t, files, ["k"], expected_version=0, txn_id="v1")
        segs_v1 = _seg_paths(t, 1)
        before = _meta_bytes(t)
        upsert(spark, t, spark.createDataFrame([(0, 99.0)], "k long, v double"), ["k"])
        segs_v2 = _seg_paths(t, 2)
        after = _meta_bytes(t)
        # the carried fileset lost exactly the touched file's chunk; all
        # other chunks are the SAME segment objects (no rewrite)
        reused = segs_v1 & segs_v2
        assert len(reused) >= len(segs_v1) - 1
        for p in reused:
            assert after[p] == before[p]
        # new SEGMENT bytes (the O(files) component) stay below a full
        # re-write of v1's segments; the list is O(filesets)-sized and
        # the at-scale payload ratio is measured in the soak (SCALE.md)
        new_segs = {
            p for p in set(after) - set(before) if p.startswith(_SEG_DIR)
        }
        full_rewrite = sum(before[p] for p in segs_v1)
        assert sum(after[p] for p in new_segs) < full_rewrite
        assert {(r.k, r.v) for r in snapshot(spark, t).collect()} == {
            (float(k) if False else k, 99.0 if k == 0 else float(k)) for k in range(40)
        }

    def test_pruned_read_loads_only_needed_segments(
        self, spark, tmp_path, monkeypatch
    ):
        """The manifest-list prune: chunk bounds in the LIST exclude
        whole segments before they are ever parsed."""
        monkeypatch.setattr(mt, "_SEG_TARGET_FILES", 4)
        t = str(tmp_path / "t")
        # one fileset per k-range so each fileset = 1 tight-bounds chunk;
        # a reader schema makes fully-pruned filesets skippable without
        # even a schema-fallback segment load
        S = (
            '{"type":"record","name":"R","fields":['
            '{"name":"k","type":"long"},{"name":"v","type":"double"}]}'
        )
        v = 0
        for lo in range(0, 40, 10):
            df = spark.range(lo, lo + 10).select(
                F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
            )
            files = stage_files(df, t)
            m = read_manifest(t, v) if v else {"files": [], "filesets": None}
            prior = m.get("filesets") or []
            from anglerfish_spark.sources.skipping import collect_file_stats

            stats = {**(m.get("stats") or {}), **collect_file_stats(t, files, ["k"])}
            v = commit(
                t,
                m["files"] + files,
                expected_version=v,
                schema=S,
                filesets=prior + [{"files": files, "schema": S, "seq": v + 1}],
                stats=stats,
                changes={"inserted": [{"files": files, "schema": S}], "deleted": []},
            )
        loads: list[str] = []
        real = mt._load_segment

        def counting(table, rel):
            loads.append(rel)
            return real(table, rel)

        monkeypatch.setattr(mt, "_load_segment", counting)
        out, rep = read_table(spark, t, predicates={"k": (12, 13)})
        assert sorted(r.k for r in out.collect()) == [12, 13]
        assert rep["files_kept"] < rep["files_total"]
        # ONLY the fileset covering [10, 20) loads any segment; the other
        # three are excluded by the LIST-level bounds alone and never
        # parsed (the manifest-list prune)
        total_chunks = sum(
            len(ss["chunks"]) for ss in read_manifest_light(t)["segsets"]
        )
        loaded = len(set(loads))
        assert loaded < total_chunks and loaded <= 2

    def test_orphan_segments_reclaimed(self, spark, tmp_path, monkeypatch):
        monkeypatch.setattr(mt, "_SEG_TARGET_FILES", 4)
        t, files = self._table(spark, tmp_path)
        commit_with_stats(spark, t, files, ["k"], expected_version=0, txn_id="v1")
        upsert(spark, t, spark.createDataFrame([(0, 99.0)], "k long, v double"), ["k"])
        segs_v1_only = _seg_paths(t, 1) - _seg_paths(t, 2)
        assert segs_v1_only  # the touched chunk's old segment
        # while v1 is retained, its segments are referenced -> kept
        assert not [p for p in vacuum(t, min_age_ms=0) if p.startswith(_SEG_DIR)]
        mt.expire_snapshots(t, keep_last=1)
        removed = mt._reclaim_segments(t, min_age_ms=0)
        assert set(removed) >= segs_v1_only
        assert {r.v for r in snapshot(spark, t).collect() if r.k == 0} == {99.0}

    def test_reader_format_fence(self, spark, tmp_path):
        t, files = self._table(spark, tmp_path)
        commit(t, files, expected_version=0,
               changes={"inserted": [{"files": files, "schema": None}], "deleted": []})
        path = mt._manifest_path(t, 1)
        with open(path) as f:
            m = json.load(f)
        m["min_reader_format"] = 4
        with open(path, "w") as f:
            json.dump(m, f)
        with pytest.raises(AnglerfishError, match="reader format"):
            read_manifest(t, 1)

    def test_chunk_grouping_contiguous_and_parent_stable(self, monkeypatch):
        monkeypatch.setattr(mt, "_SEG_TARGET_FILES", 10)
        files = [f"data/x/{i:04d}.parquet" for i in range(100)]
        a = mt._chunk_fileset(files)
        assert a == mt._chunk_fileset(list(reversed(files)))  # deterministic
        # fresh chunking is CONTIGUOUS over the sorted list (locality ->
        # tight per-chunk column bounds for the manifest-list prune)
        assert [g[0] for g in a] == [files[i] for i in range(0, 100, 10)]
        # carrying with a parent structure: removing one file rewrites
        # only its own chunk; every other group is preserved verbatim
        f0 = files[17]
        c = mt._chunk_fileset([f for f in files if f != f0], parent_chunks=a)
        changed = [g for g in c if g not in a]
        assert len(changed) == 1 and f0 not in changed[0]
        assert len([g for g in a if g in c]) == len(a) - 1
