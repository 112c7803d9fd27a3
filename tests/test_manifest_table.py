"""Mocked lakehouse commit protocol (VERDICT r4 missing #3): snapshot
atomicity, optimistic-concurrency conflict, txn-id replay idempotency,
crash-orphan invisibility + vacuum, time travel, and the manifest-backed
keyed-upsert streaming sink."""

from __future__ import annotations

import os
import tempfile

import pytest

from anglerfish_spark.sources.manifest_table import (
    ConcurrentCommitError,
    commit,
    current_version,
    read_manifest,
    snapshot,
    stage_files,
    start_manifest_upsert_sink,
    upsert,
    vacuum,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestCommitProtocol:
    def test_staged_files_invisible_until_commit(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.createDataFrame([(1, "a")], ["k", "v"])
        files = stage_files(df, t)
        assert files
        # no snapshot exists yet: the data files are not reachable
        assert current_version(t) == 0
        with pytest.raises(FileNotFoundError):
            snapshot(spark, t)
        commit(t, files, expected_version=0)
        assert current_version(t) == 1
        assert _rows(snapshot(spark, t)) == [(1, "a")]

    def test_concurrent_commit_conflict(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.createDataFrame([(1, "a")], ["k", "v"])
        f1 = stage_files(df, t)
        f2 = stage_files(df, t)
        commit(t, f1, expected_version=0)
        # the second writer based its commit on version 0 too -> conflict
        with pytest.raises(ConcurrentCommitError):
            commit(t, f2, expected_version=0)
        # rebase on the new snapshot and retry: wins as version 2
        assert commit(t, f2, expected_version=1) == 2

    def test_upsert_replaces_keys_and_time_travels(self, spark, tmp_path):
        t = str(tmp_path / "t")
        upsert(spark, t, spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"]), ["k"])
        upsert(spark, t, spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"]), ["k"])
        assert _rows(snapshot(spark, t)) == [(1, "a"), (2, "B"), (3, "c")]
        # AS OF version 1: the pre-merge world is still readable
        assert _rows(snapshot(spark, t, version=1)) == [(1, "a"), (2, "b")]

    def test_txn_replay_is_noop(self, spark, tmp_path):
        t = str(tmp_path / "t")
        b = spark.createDataFrame([(1, "a")], ["k", "v"])
        v1 = upsert(spark, t, b, ["k"], txn_id="batch-7")
        # foreachBatch redelivers the same epoch after a crash:
        v2 = upsert(spark, t, b, ["k"], txn_id="batch-7")
        assert v1 == v2 == 1
        assert read_manifest(t)["txn_id"] == "batch-7"
        assert _rows(snapshot(spark, t)) == [(1, "a")]

    def test_txn_replay_after_interleaved_commit_is_still_noop(self, spark, tmp_path):
        """A replayed batch must be recognized even when OTHER commits
        landed after its original — the txn check scans history, not just
        the latest manifest."""
        t = str(tmp_path / "t")
        upsert(spark, t, spark.createDataFrame([(1, "a")], ["k", "v"]), ["k"], txn_id="batch-1")
        upsert(spark, t, spark.createDataFrame([(2, "b")], ["k", "v"]), ["k"], txn_id="batch-2")
        # crash-recovery redelivers batch-1 after batch-2 already committed
        v = upsert(
            spark, t, spark.createDataFrame([(1, "a")], ["k", "v"]), ["k"], txn_id="batch-1"
        )
        assert v == 2  # no third version
        assert _rows(snapshot(spark, t)) == [(1, "a"), (2, "b")]

    def test_vacuum_removes_only_orphans(self, spark, tmp_path):
        t = str(tmp_path / "t")
        df = spark.createDataFrame([(1, "a")], ["k", "v"])
        committed = stage_files(df, t)
        commit(t, committed, expected_version=0)
        orphans = stage_files(df, t)  # a crashed writer's leftovers
        removed = vacuum(t)
        assert sorted(removed) == sorted(orphans)
        assert _rows(snapshot(spark, t)) == [(1, "a")]  # snapshot intact


class TestManifestUpsertSink:
    def test_streaming_upsert_commits_per_batch(self, spark, tmp_path):
        t = str(tmp_path / "table")
        with tempfile.TemporaryDirectory() as d:
            src = f"{d}/src"
            spark.createDataFrame(
                [(1, "a"), (2, "b"), (2, "b2")], ["k", "v"]
            ).write.json(src)
            stream = spark.readStream.schema("k long, v string").json(src)
            q = start_manifest_upsert_sink(
                stream, t, ["k"], checkpoint=f"{d}/ckpt"
            )
            q.awaitTermination(300)
        assert current_version(t) >= 1
        got = {r["k"]: r["v"] for r in snapshot(spark, t).collect()}
        assert set(got) == {1, 2}
        assert read_manifest(t)["txn_id"].startswith("batch-")
