"""Hidden partitioning (sources/partitioning.py): transform
correctness (Spark write expression == Python probe), manifest-only
file pruning before stats, rename evolution, null handling, and the
registered demo's prune counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anglerfish_spark.errors import AnglerfishError
from anglerfish_spark.sources.manifest_table import commit, snapshot
from anglerfish_spark.sources.partitioning import (
    _bucket_py,
    fill_spec,
    file_may_match_partition,
    partition_column,
    stage_files_partitioned,
)
from anglerfish_spark.sources.read_path import read_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, tmp_path, df, spec, name="t", schema=None):
    t = str(tmp_path / name)
    files, parts, filled = stage_files_partitioned(spark, df, t, spec)
    commit(
        t,
        files,
        expected_version=0,
        schema=schema,
        filesets=[{"files": files, "schema": schema, "seq": 1}] if schema else None,
        partition_spec=filled,
        partitions=parts,
        changes={"inserted": [{"files": files, "schema": schema}], "deleted": []},
    )
    return t


class TestTransforms:
    def test_bucket_python_equals_spark(self, spark):
        df = spark.range(200).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("s")
        )
        for col in ("k", "s"):
            entry = fill_spec(df, [{"transform": "bucket", "col": col, "n": 7}])[0]
            got = df.select(
                F.col(col).cast("string").alias("v"),
                partition_column(entry).alias("b"),
            ).collect()
            for r in got:
                assert int(r.b) == _bucket_py(r.v, 7), (col, r.v)

    def test_truncate_numeric_and_string(self, spark):
        df = spark.createDataFrame(
            [(17, "alpha"), (20, "alps"), (-5, "b")], "n long, s string"
        )
        en = fill_spec(df, [{"transform": "truncate", "col": "n", "w": 10}])[0]
        es = fill_spec(df, [{"transform": "truncate", "col": "s", "w": 3}])[0]
        got = df.select(
            "n", "s",
            partition_column(en).alias("tn"),
            partition_column(es).alias("ts"),
        ).collect()
        by_n = {r.n: (r.tn, r.ts) for r in got}
        assert by_n[17][0] == "10" and by_n[20][0] == "20"
        assert by_n[-5][0] == str(-5 - (-5 % 10))  # pmod: -5 % 10 = 5 -> -10
        assert by_n[17][1] == "alp" and by_n[20][1] == "alp" and by_n[-5][1] == "b"

    def test_spec_validation(self, spark):
        df = spark.range(3).select(F.col("id").alias("k"), (F.col("id") * 0.5).alias("x"))
        with pytest.raises(AnglerfishError, match="unknown partition transform"):
            fill_spec(df, [{"transform": "year", "col": "k"}])
        with pytest.raises(AnglerfishError, match="integer 'n'"):
            fill_spec(df, [{"transform": "bucket", "col": "k"}])
        with pytest.raises(AnglerfishError, match="absent"):
            fill_spec(df, [{"transform": "identity", "col": "nope"}])
        with pytest.raises(AnglerfishError, match="floating"):
            e = fill_spec(df, [{"transform": "bucket", "col": "x", "n": 2}])[0]
            partition_column(e)


class TestPartitionPruning:
    def _table(self, spark, tmp_path):
        df = spark.range(100).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("string").alias("cat"),
            (F.col("id") * 1.0).alias("v"),
        )
        return _mk(
            spark,
            tmp_path,
            df,
            [
                {"transform": "identity", "col": "cat"},
                {"transform": "bucket", "col": "k", "n": 3},
            ],
        )

    def test_identity_range_prunes_and_reads_right_rows(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        df, rep = read_table(spark, t, predicates={"cat": ("2", "2")})
        assert rep["files_kept"] < rep["files_total"]
        assert rep["files_kept"] <= rep["files_total"] // 4 + 1
        assert sorted(r.k for r in df.collect()) == [k for k in range(100) if k % 4 == 2]

    def test_bucket_equality_prunes_to_one_bucket(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        df, rep = read_table(spark, t, predicates={"k": (42, 42)})
        # one bucket per cat dir survives: 4 files of 12
        assert rep["files_total"] == 12 and rep["files_kept"] == 4
        assert [tuple(r) for r in df.collect()] == [(42, "2", 42.0)]

    def test_bucket_range_does_not_prune(self, spark, tmp_path):
        """A hash destroys order: range predicates must keep every
        bucket (correctness over eagerness)."""
        t = self._table(spark, tmp_path)
        df, rep = read_table(spark, t, predicates={"k": (10, 20)})
        assert rep["files_kept"] == rep["files_total"]
        assert sorted(r.k for r in df.collect()) == list(range(10, 21))

    def test_combined_point_lookup(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        df, rep = read_table(spark, t, predicates={"cat": ("2", "2"), "k": (42, 42)})
        assert rep["files_kept"] == 1
        assert [tuple(r) for r in df.collect()] == [(42, "2", 42.0)]

    def test_no_predicates_reads_everything(self, spark, tmp_path):
        t = self._table(spark, tmp_path)
        assert snapshot(spark, t).count() == 100

    def test_null_partition_values_never_pruned(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b")], "k long, cat string"
        )
        t = _mk(spark, tmp_path, df, [{"transform": "identity", "col": "cat"}])
        out, rep = read_table(spark, t, predicates={"cat": ("a", "a")})
        # the null-cat file is kept (cannot prove no match under SQL
        # semantics the residual filter then applies), the 'b' file drops
        assert rep["files_kept"] < rep["files_total"]
        assert [r.k for r in out.collect()] == [1]

    def test_unstamped_file_is_kept(self, spark, tmp_path):
        """A file committed by a spec-less writer (no recorded tuple)
        must survive every partition prune."""
        spec = [{"transform": "identity", "col": "cat", "vtype": "string"}]
        assert file_may_match_partition(spec, None, {"cat": ("x", "x")})

    def test_truncate_range_pruning(self, spark, tmp_path):
        df = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("s"))
        t = _mk(spark, tmp_path, df, [{"transform": "truncate", "col": "k", "w": 25}])
        out, rep = read_table(spark, t, predicates={"k": (30, 45)})
        assert rep["files_kept"] < rep["files_total"]
        assert sorted(r.k for r in out.collect()) == list(range(30, 46))


class TestRenameEvolution:
    def test_pruning_survives_partition_column_rename(self, spark, tmp_path):
        """The spec freezes the write-time column name; after an alias
        rename the reader's predicates (new name) must still map onto
        the stamped tuples."""
        S1 = (
            '{"type":"record","name":"R","fields":['
            '{"name":"k","type":"long"},{"name":"v","type":"double"}]}'
        )
        S2 = (
            '{"type":"record","name":"R","fields":['
            '{"name":"key","type":"long","aliases":["k"]},'
            '{"name":"v","type":"double"}]}'
        )
        df = spark.range(40).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        t = _mk(
            spark, tmp_path, df,
            [{"transform": "truncate", "col": "k", "w": 10}],
            schema=S1,
        )
        from anglerfish_spark.sources.manifest_table import read_manifest

        m = read_manifest(t)
        # metadata-only evolution commit: same files/partitions, new reader
        commit(
            t,
            m["files"],
            expected_version=1,
            schema=S2,
            filesets=m["filesets"],
            partition_spec=m["partition_spec"],
            partitions=m["partitions"],
            changes={"inserted": [], "deleted": []},
        )
        out, rep = read_table(spark, t, predicates={"key": (15, 15)})
        assert rep["files_kept"] < rep["files_total"]
        assert [tuple(r) for r in out.collect()] == [(15, 15.0)]


class TestRegisteredDemo:
    def test_demo_prune_counts(self, spark, sf_dir):
        from anglerfish_spark.sources.partitioning import (
            _PART_PROBE_KEY,
            read_partitioned_report,
        )

        _, rep = read_partitioned_report(
            spark, sf_dir, {"o_orderpriority": ("1-URGENT", "1-URGENT")}
        )
        assert rep["files_kept"] * 4 <= rep["files_total"]  # 1 of 5 priorities
        _, rep2 = read_partitioned_report(
            spark, sf_dir, {"o_orderkey": (_PART_PROBE_KEY, _PART_PROBE_KEY)}
        )
        assert rep2["files_kept"] * 3 <= rep2["files_total"]  # 1 of 4 buckets
        _, rep3 = read_partitioned_report(
            spark,
            sf_dir,
            {
                "o_orderpriority": ("1-URGENT", "1-URGENT"),
                "o_orderkey": (_PART_PROBE_KEY, _PART_PROBE_KEY),
            },
        )
        assert rep3["files_kept"] <= 2  # ~1 of 20


class TestSpecSurvival:
    """Partition metadata is table-level state: unrelated commits
    (upsert/delete/compact) inherit it, appends extend it."""

    def _table(self, spark, tmp_path):
        df = spark.range(60).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("cat"),
            (F.col("id") * 1.0).alias("v"),
        )
        return _mk(
            spark, tmp_path, df,
            [{"transform": "identity", "col": "cat"}],
        )

    def test_upsert_keeps_pruning_for_untouched_files(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import read_manifest, upsert

        t = self._table(spark, tmp_path)
        batch = spark.createDataFrame([(0, "0", 99.0), (100, "9", 1.0)], "k long, cat string, v double")
        upsert(spark, t, batch, ["k"])
        m = read_manifest(t)
        assert m["partition_spec"]  # inherited, not dropped
        out, rep = read_table(spark, t, predicates={"cat": ("1", "1")})
        # cat=0 and cat=2 tuple files pruned; the upsert's unstamped new
        # fileset is conservatively kept
        assert rep["files_kept"] < rep["files_total"]
        assert sorted(r.k for r in out.collect()) == [k for k in range(60) if k % 3 == 1]

    def test_delete_keys_keeps_partitions(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import delete_keys, read_manifest

        t = self._table(spark, tmp_path)
        delete_keys(spark, t, "k", spark.createDataFrame([(5,)], "k long"))
        m = read_manifest(t)
        assert m["partition_spec"] and m["partitions"]
        out, rep = read_table(spark, t, predicates={"cat": ("2", "2")})
        assert rep["files_kept"] < rep["files_total"]
        assert sorted(r.k for r in out.collect()) == [
            k for k in range(60) if k % 3 == 2 and k != 5
        ]

    def test_append_partitioned_extends_tuples(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import read_manifest
        from anglerfish_spark.sources.partitioning import append_partitioned

        t = self._table(spark, tmp_path)
        new = spark.createDataFrame(
            [(100, "1", 1.0), (101, "7", 7.0)], "k long, cat string, v double"
        )
        append_partitioned(spark, t, new, txn_id="ap-1")
        m = read_manifest(t)
        assert len(m["partitions"]) == len(m["files"])  # every file stamped
        out, rep = read_table(spark, t, predicates={"cat": ("1", "1")})
        assert rep["files_kept"] < rep["files_total"]
        assert sorted(r.k for r in out.collect()) == [
            k for k in range(60) if k % 3 == 1
        ] + [100]
        # replay idempotent
        v = m["version"]
        assert append_partitioned(spark, t, new, txn_id="ap-1") == v
        # change feed logged the append exactly
        from anglerfish_spark.sources.read_path import table_changes

        logged, mode = table_changes(spark, t, v - 1, v, mode="logged")
        assert mode == "logged"
        assert sorted(tuple(r) for r in logged.collect()) == [
            (100, "1", 1.0, "insert"), (101, "7", 7.0, "insert"),
        ]

    def test_append_partitioned_requires_spec(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import upsert
        from anglerfish_spark.sources.partitioning import append_partitioned

        t = str(tmp_path / "plain")
        upsert(spark, t, spark.createDataFrame([(1, "a")], ["k", "v"]), ["k"])
        with pytest.raises(AnglerfishError, match="no partition spec"):
            append_partitioned(spark, t, spark.createDataFrame([(2, "b")], ["k", "v"]))


class TestPartitionedCompaction:
    def test_compact_restamps_tuples_and_keeps_pruning(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import (
            compact_table,
            read_manifest,
            upsert,
        )

        df = spark.range(60).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("cat"),
        )
        t = _mk(spark, tmp_path, df, [{"transform": "identity", "col": "cat"}])
        # an upsert adds an unstamped fileset first (worst case)
        upsert(spark, t, spark.createDataFrame([(100, "1")], "k long, cat string"), ["k"])
        before = _rows(snapshot(spark, t))
        compact_table(spark, t)
        m = read_manifest(t)
        assert m["partition_spec"] and len(m["partitions"]) == len(m["files"])
        assert _rows(snapshot(spark, t)) == before
        out, rep = read_table(spark, t, predicates={"cat": ("1", "1")})
        assert rep["files_kept"] < rep["files_total"]
        assert sorted(r.k for r in out.collect()) == [
            k for k in range(60) if k % 3 == 1
        ] + [100]


class TestKeyedWritesStampTuples:
    """Steady-state keyed writes on a partitioned table keep EVERY file
    stamped: pruning stays exact, not merely conservative."""

    def _table(self, spark, tmp_path):
        df = spark.range(60).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("cat"),
            (F.col("id") * 1.0).alias("v"),
        )
        return _mk(spark, tmp_path, df, [{"transform": "identity", "col": "cat"}])

    def test_upsert_stamps_new_fileset(self, spark, tmp_path):
        from anglerfish_spark.sources.manifest_table import read_manifest, upsert

        t = self._table(spark, tmp_path)
        upsert(
            spark, t,
            spark.createDataFrame([(0, "0", 99.0), (100, "7", 1.0)], "k long, cat string, v double"),
            ["k"],
        )
        m = read_manifest(t)
        assert len(m["partitions"]) == len(m["files"])  # every file stamped
        out, rep = read_table(spark, t, predicates={"cat": ("7", "7")})
        assert rep["files_kept"] == 1  # exact: only the new cat=7 file
        assert [tuple(r) for r in out.collect()] == [(100, "7", 1.0)]

    def test_merge_stamps_both_modes(self, spark, tmp_path):
        from anglerfish_spark.localdata import local_df
        from anglerfish_spark.sources.manifest_table import read_manifest
        from anglerfish_spark.sources.merge import merge_into

        for mode in ("cow", "mor"):
            t = self._table(spark, tmp_path)
            src = local_df(spark, [(0, "0", 5.0), (200, "9", 9.0)], ["k", "cat", "v"])
            merge_into(
                spark, t, src, ["k"],
                when_matched_update={"v": "s.v"}, mode=mode,
            )
            m = read_manifest(t)
            assert len(m["partitions"]) == len(m["files"]), mode
            out, rep = read_table(spark, t, predicates={"cat": ("9", "9")})
            assert rep["files_kept"] == 1, mode
            assert [tuple(r) for r in out.collect()] == [(200, "9", 9.0)], mode
            import shutil

            shutil.rmtree(t)


class TestSpecEvolution:
    def test_evolve_spec_keeps_old_tuples_pruning_under_old_spec(self, spark, tmp_path):
        """VERDICT r9 #2 (full Iceberg model): spec evolution records a
        spec HISTORY and per-fileset spec ids — pre-evolution files keep
        their tuples AND keep pruning under their OLD transforms; files
        written after evolution prune under the new ones; neither era is
        ever interpreted under the wrong spec."""
        from anglerfish_spark.sources.manifest_table import (
            compact_table,
            read_manifest,
            upsert,
        )
        from anglerfish_spark.sources.partitioning import evolve_partition_spec

        df = spark.range(60).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("cat"),
        )
        t = _mk(spark, tmp_path, df, [{"transform": "identity", "col": "cat"}])
        before = _rows(snapshot(spark, t))
        evolve_partition_spec(spark, t, [{"transform": "bucket", "col": "k", "n": 4}])
        m = read_manifest(t)
        assert m["partition_spec"][0]["transform"] == "bucket"  # new default
        assert len(m["specs"]) == 2 and m["default_spec_id"] == 1
        assert m["partitions"]  # old tuples KEPT, pinned to spec 0
        assert all(fs["spec_id"] == 0 for fs in m["filesets"])
        assert _rows(snapshot(spark, t)) == before  # zero data movement
        # OLD-spec predicate STILL prunes the pre-evolution files
        out, rep = read_table(spark, t, predicates={"cat": ("1", "1")})
        assert rep["files_kept"] < rep["files_total"]
        assert sorted(r.k for r in out.collect()) == [k for k in range(60) if k % 3 == 1]
        # NEW-spec predicate does not misprune old files (their tuples
        # belong to spec 0, which has no k entry -> conservatively kept)
        out, rep = read_table(spark, t, predicates={"k": (42, 42)})
        assert rep["files_kept"] == rep["files_total"]
        assert [r.k for r in out.collect()] == [42]
        # a write AFTER evolution stamps NEW-spec tuples (spec_id 1)
        upsert(spark, t, spark.createDataFrame([(100, "9")], "k long, cat string"), ["k"])
        m2 = read_manifest(t)
        new_sets = [fs for fs in m2["filesets"] if fs.get("seq") == m2["version"]]
        assert new_sets and all(fs["spec_id"] == 1 for fs in new_sets)
        # compaction restamps EVERYTHING under the new spec: exact again
        compact_table(spark, t)
        m3 = read_manifest(t)
        assert len(m3["partitions"]) == len(m3["files"])
        out, rep = read_table(spark, t, predicates={"k": (42, 42)})
        assert rep["files_kept"] < rep["files_total"]
        assert [r.k for r in out.collect()] == [42]

    def test_evolution_change_feed_is_empty(self, spark, tmp_path):
        from anglerfish_spark.sources.partitioning import evolve_partition_spec
        from anglerfish_spark.sources.read_path import table_changes

        df = spark.range(10).select(F.col("id").alias("k"), F.lit("x").alias("cat"))
        t = _mk(spark, tmp_path, df, [{"transform": "identity", "col": "cat"}])
        v = evolve_partition_spec(spark, t, [{"transform": "truncate", "col": "k", "w": 5}])
        logged, mode = table_changes(spark, t, v - 1, v, mode="logged")
        assert mode == "logged" and logged.count() == 0


class TestProbeBoundNormalization:
    """ADVICE r9 mediums #1/#2: probe-side bound handling must match the
    write side exactly — floor truncation for negatives, _enc
    normalization for date bounds on string-typed tuples."""

    def test_truncate_negative_bound_floors_like_pmod(self):
        # write side stamps value - pmod(value, w): -5 % 1000 -> tuple
        # "-1000"; the probe for lo=-5 must compute tlo=-1000, not 0
        spec = [{"transform": "truncate", "col": "x", "w": 1000, "vtype": "long"}]
        assert file_may_match_partition(spec, ["-1000"], {"x": (-5, -5)})
        # and a genuinely-out-of-range probe still prunes
        assert not file_may_match_partition(spec, ["-1000"], {"x": (5, 10)})
        assert not file_may_match_partition(spec, ["2000"], {"x": (-5, -5)})

    def test_truncate_on_double_is_refused_at_spec_time(self, spark):
        df = spark.range(3).select((F.col("id") * 0.5).alias("x"))
        with pytest.raises(AnglerfishError, match="floating"):
            fill_spec(df, [{"transform": "truncate", "col": "x", "w": 1000}])

    def test_date_bound_on_identity_date_partition(self, spark, tmp_path):
        import datetime as dt

        df = spark.createDataFrame(
            [(1, dt.date(2024, 1, 10)), (2, dt.date(2024, 6, 10)), (3, dt.date(2024, 12, 10))],
            "k long, d date",
        )
        t = _mk(spark, tmp_path, df, [{"transform": "identity", "col": "d"}])
        # a date-object predicate must neither raise nor misprune
        out, rep = read_table(
            spark, t, predicates={"d": (dt.date(2024, 6, 1), dt.date(2024, 6, 30))}
        )
        assert rep["files_kept"] < rep["files_total"]
        assert [r.k for r in out.collect()] == [2]

    def test_date_keyed_upsert_probe_does_not_raise(self, spark, tmp_path):
        """The canonical identity(date) layout keyed on the date column:
        _probe_touched_files feeds date bounds into the partition probe."""
        import datetime as dt

        from anglerfish_spark.sources.manifest_table import upsert

        df = spark.createDataFrame(
            [(1, dt.date(2024, 1, 10), 1.0), (2, dt.date(2024, 6, 10), 2.0)],
            "k long, d date, v double",
        )
        t = _mk(spark, tmp_path, df, [{"transform": "identity", "col": "d"}])
        batch = spark.createDataFrame(
            [(2, dt.date(2024, 6, 10), 99.0)], "k long, d date, v double"
        )
        upsert(spark, t, batch, ["d"])
        got = {(r.k, r.v) for r in snapshot(spark, t).collect()}
        assert got == {(1, 1.0), (2, 99.0)}

    def test_non_string_bound_on_string_tuple_keeps_file(self):
        # a numeric bound against a string-typed tuple must keep (no
        # lexical number-vs-string comparison, no TypeError)
        spec = [{"transform": "identity", "col": "s", "vtype": "string"}]
        assert file_may_match_partition(spec, ["9"], {"s": (10, 10)})
        spec_t = [{"transform": "truncate", "col": "s", "w": 2, "vtype": "string"}]
        assert file_may_match_partition(spec_t, ["ab"], {"s": (3, 7)})


class TestPartitionedZorder:
    def test_zorder_keeps_layout_tuples_and_pruning(self, spark, tmp_path):
        """OPTIMIZE ZORDER on a PARTITIONED table must not forfeit
        partition pruning: the rewrite re-stages through the spec with a
        within-partition Z sort, so every new file carries its tuple AND
        footer stats on the indexed columns (pre-r10 the zordered files
        inherited no tuples and partition predicates stopped pruning)."""
        from anglerfish_spark.sources.manifest_table import read_manifest
        from anglerfish_spark.sources.skipping import zorder_compact

        df = spark.range(120).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("string").alias("cat"),
            (F.col("id") % 7).cast("double").alias("x"),
        )
        t = _mk(spark, tmp_path, df, [{"transform": "identity", "col": "cat"}])
        before = _rows(snapshot(spark, t))
        zorder_compact(spark, t, ["k", "x"], n_files=4)
        m = read_manifest(t)
        assert m["partition_spec"] and len(m["partitions"]) == len(m["files"])
        assert _rows(snapshot(spark, t)) == before
        # partition predicate still prunes to the one tuple
        out, rep = read_table(spark, t, predicates={"cat": ("2", "2")})
        assert rep["files_kept"] < rep["files_total"]
        assert sorted(r.k for r in out.collect()) == [
            k for k in range(120) if k % 4 == 2
        ]
        # z stats recorded: a k range outside a file's box prunes too
        assert m.get("stats") and all(m["stats"].get(f) for f in m["files"])


class TestPartitionedWap:
    def test_published_batch_keeps_pruning(self, spark, tmp_path):
        """stage_append on a partitioned table stages THROUGH the spec;
        after publish the whole table — carried files AND the published
        batch — prunes exactly on partition predicates (pre-r10 the
        published fileset had no tuples and escaped pruning forever)."""
        from anglerfish_spark.sources.manifest_table import read_manifest
        from anglerfish_spark.sources.wap import (
            audit_staged,
            publish_staged,
            stage_append,
        )

        df = spark.range(60).select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("cat"),
        )
        t = _mk(spark, tmp_path, df, [{"transform": "identity", "col": "cat"}])
        batch = spark.createDataFrame([(100, "1"), (101, "2")], "k long, cat string")
        stage_append(spark, t, batch, "cand")
        # audit sees current + staged
        assert audit_staged(spark, t, "cand").count() == 62
        publish_staged(spark, t, "cand")
        m = read_manifest(t)
        assert len(m["partitions"]) == len(m["files"])  # every file stamped
        out, rep = read_table(spark, t, predicates={"cat": ("1", "1")})
        assert rep["files_kept"] < rep["files_total"]
        assert sorted(r.k for r in out.collect()) == [
            k for k in range(60) if k % 3 == 1
        ] + [100]


class TestPartitionedEvolvedAppend:
    def test_append_evolved_stamps_tuples_through_rename(self, spark, tmp_path):
        """append_evolved on a partitioned table stages THROUGH the spec
        (pre-r10 the evolved fileset carried no tuples and escaped
        pruning): the spec's frozen column name remaps through the new
        reader's aliases, so the batch partitions on its CURRENT name and
        both eras prune under one predicate."""
        from anglerfish_spark.sources.manifest_table import append_evolved, read_manifest

        S1 = (
            '{"type":"record","name":"R","fields":['
            '{"name":"k","type":"long"},{"name":"cat","type":"string"}]}'
        )
        S2 = (
            '{"type":"record","name":"R","fields":['
            '{"name":"k","type":"long"},'
            '{"name":"category","type":"string","aliases":["cat"]}]}'
        )
        df = spark.range(60).select(
            F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("cat")
        )
        t = _mk(spark, tmp_path, df, [{"transform": "identity", "col": "cat"}], schema=S1)
        batch = spark.createDataFrame([(100, "1"), (101, "2")], "k long, category string")
        append_evolved(spark, t, batch, S2, reader_schema=S2)
        m = read_manifest(t)
        assert len(m["partitions"]) == len(m["files"])  # every file stamped
        out, rep = read_table(spark, t, predicates={"category": ("1", "1")})
        assert rep["files_kept"] < rep["files_total"]
        assert sorted(r.k for r in out.collect()) == [
            k for k in range(60) if k % 3 == 1
        ] + [100]


class TestReviewFixesR10:
    def test_truncate_probe_non_numeric_bound_keeps_file(self):
        """A bound the truncate arithmetic cannot take (string against a
        numeric column) is unbounded — conservative keep, never a
        TypeError crash (the _string_bound convention, review r10)."""
        from anglerfish_spark.sources.partitioning import file_may_match_partition

        spec = [{"transform": "truncate", "col": "k", "w": 10, "vtype": "long"}]
        assert file_may_match_partition(spec, ["20"], {"k": ("5", "9")}) is True
        assert file_may_match_partition(spec, ["20"], {"k": (5, 9)}) is False

    def test_wap_publish_after_spec_evolution_keeps_stage_time_spec(self, spark, tmp_path):
        """Spec evolution BETWEEN stage and publish: the published
        fileset must be stamped under the STAGE-time spec id, or its
        truncate tuples get interpreted under the new bucket transform
        and rows silently vanish from reads (review r10)."""
        from anglerfish_spark.sources.partitioning import evolve_partition_spec
        from anglerfish_spark.sources.wap import publish_staged, stage_append

        df = spark.range(40).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        t = _mk(spark, tmp_path, df, [{"transform": "truncate", "col": "k", "w": 10}])
        batch = spark.createDataFrame([(45, -1.0), (100, -2.0)], "k long, v double")
        stage_append(spark, t, batch, "cand")
        evolve_partition_spec(spark, t, [{"transform": "bucket", "col": "k", "n": 4}])
        publish_staged(spark, t, "cand")
        # every key present: the staged truncate tuples were not read
        # through the bucket transform
        out, rep = read_table(spark, t, predicates={"k": (45, 45)})
        assert [r.v for r in out.collect()] == [-1.0]
        # and they still PRUNE under their own (old) spec
        assert rep["files_kept"] < rep["files_total"]

    def test_append_evolved_batch_under_old_writer_schema(self, spark, tmp_path):
        """append_evolved where the BATCH still carries the old writer
        names but the reader renames: the spec remap must follow the
        writer schema (the batch's names), not the reader's (review
        r10 — the reader-based remap raised at staging)."""
        from anglerfish_spark.sources.manifest_table import append_evolved, read_manifest

        S1 = (
            '{"type":"record","name":"R","fields":['
            '{"name":"k","type":"long"},{"name":"cat","type":"string"}]}'
        )
        S2 = (
            '{"type":"record","name":"R","fields":['
            '{"name":"k","type":"long"},'
            '{"name":"category","type":"string","aliases":["cat"]}]}'
        )
        df = spark.range(60).select(
            F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("cat")
        )
        t = _mk(spark, tmp_path, df, [{"transform": "identity", "col": "cat"}], schema=S1)
        # batch written under the OLD schema, reader evolves to the rename
        batch = spark.createDataFrame([(100, "1")], "k long, cat string")
        append_evolved(spark, t, batch, S1, reader_schema=S2)
        m = read_manifest(t)
        assert len(m["partitions"]) == len(m["files"])
        out, rep = read_table(spark, t, predicates={"category": ("1", "1")})
        assert rep["files_kept"] < rep["files_total"]
        assert sorted(r.k for r in out.collect()) == [
            k for k in range(60) if k % 3 == 1
        ] + [100]


def test_zorder_n_files_honored_on_partitioned(spark, tmp_path):
    """ADVICE r10 #3: zorder_compact on a PARTITIONED table must honor
    the n_files target — a low-cardinality spec (3 tag tuples) with
    n_files=9 range-splits hot tuples across multiple files instead of
    writing one giant file per tuple, while every file stays
    single-tuple (pruning exactness unchanged)."""
    from pyspark.sql import functions as F

    from anglerfish_spark.sources.manifest_table import commit, read_manifest, snapshot
    from anglerfish_spark.sources.partitioning import stage_files_partitioned
    from anglerfish_spark.sources.read_path import read_table
    from anglerfish_spark.sources.skipping import zorder_compact

    t = str(tmp_path / "t")
    df = spark.range(3000).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("tag"),
        (F.col("id") * 1.0).alias("v"),
    )
    spec = [{"transform": "identity", "col": "tag"}]
    files, parts, filled = stage_files_partitioned(spark, df, t, spec)
    commit(
        t, files, expected_version=0, partition_spec=filled, partitions=parts,
        changes={"inserted": [{"files": files, "schema": None}], "deleted": []},
    )
    before = sorted(tuple(r) for r in snapshot(spark, t).collect())
    v = zorder_compact(spark, t, ["k"], n_files=9)
    m = read_manifest(t, v)
    n = len(m["files"])
    assert n > 3, f"n_files ignored: {n} files for 3 tuples"
    assert n <= 9 + 3, f"file explosion: {n}"  # boundary tasks may span 2 tuples
    # every file keeps a single-tuple stamp and content equals pre-compact
    assert all(len(tup) == 1 for tup in m["partitions"].values())
    assert sorted(tuple(r) for r in snapshot(spark, t).collect()) == before
    # partition pruning still exact on a tag slice
    df2, rep = read_table(spark, t, predicates={"tag": ("1", "1")})
    got = sorted(tuple(r) for r in df2.collect())
    want = sorted(tuple(r) for r in before if r[1] == "1")
    assert got == want
    assert rep["files_kept"] < rep["files_total"]
