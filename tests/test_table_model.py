"""Model-based differential for the manifest table's write surface:
random sequences of keyed writes (upsert / three-clause MERGE in both
modes / delete_keys / delete_where / compact / compact_deletes) run
against a plain Python dict model; after EVERY op the snapshot must
equal the model, a randomly chosen historical version must equal its
recorded model state, and the per-step logged change feed must equal
the independent diff.  Seeds rotate with ANGLERFISH_FUZZ_SEED."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from anglerfish_spark.localdata import local_df
from anglerfish_spark.sources.manifest_table import (
    compact_deletes,
    compact_table,
    current_version,
    delete_keys,
    delete_where,
    snapshot,
    upsert,
)
from anglerfish_spark.sources.merge import merge_into
from anglerfish_spark.sources.read_path import table_changes

SEED = int(os.environ.get("ANGLERFISH_FUZZ_SEED", "0")) + 424242
N_OPS = 14
KEYSPACE = 30


def _state(spark, t):
    return {r.k: (r.v, r.tag) for r in snapshot(spark, t).collect()}


def _df(spark, rows):
    return local_df(spark, rows, ["k", "v", "tag"]).select(
        F.col("k").cast("long"), F.col("v").cast("double"), "tag"
    )


@pytest.mark.parametrize("trial", range(3))
def test_random_write_sequences_match_model(spark, tmp_path, trial):
    rng = random.Random(SEED + trial)
    t = str(tmp_path / f"t{trial}")
    model: dict[int, tuple] = {}
    history: list[dict] = []  # model state per committed version

    def batch_rows(n):
        return [
            (rng.randrange(KEYSPACE), float(rng.randrange(1000)), rng.choice("abc"))
            for _ in range(n)
        ]

    # initial load
    rows = batch_rows(12)
    first = {}
    for k, v, tag in rows:
        first[k] = (v, tag)  # dropDuplicates keeps one row per key
    rows = [(k, v, tag) for k, (v, tag) in first.items()]
    upsert(spark, t, _df(spark, rows), ["k"])
    model.update(first)
    history.append(dict(model))

    for step in range(N_OPS):
        v_before = current_version(t)
        op = rng.choice(
            ["upsert", "merge_cow", "merge_mor", "delete_keys", "delete_where",
             "compact", "compact_deletes", "restore"]
        )
        if op == "upsert":
            rows = list({r[0]: r for r in batch_rows(rng.randrange(1, 6))}.values())
            upsert(spark, t, _df(spark, rows), ["k"])
            for k, v, tag in rows:
                model[k] = (v, tag)
        elif op in ("merge_cow", "merge_mor"):
            rows = list({r[0]: r for r in batch_rows(rng.randrange(1, 6))}.values())
            merge_into(
                spark, t, _df(spark, rows), ["k"],
                when_matched_update={"v": "s.v", "tag": "s.tag"},
                when_matched_delete="s.tag = 'a'",
                insert_not_matched=True,
                mode="cow" if op == "merge_cow" else "mor",
            )
            for k, v, tag in rows:
                if k in model and tag == "a":
                    del model[k]
                elif k in model:
                    model[k] = (v, tag)
                else:
                    model[k] = (v, tag)
        elif op == "delete_keys":
            ks = sorted({rng.randrange(KEYSPACE) for _ in range(rng.randrange(1, 4))})
            delete_keys(spark, t, "k", local_df(spark, [(k,) for k in ks], ["k"]).select(F.col("k").cast("long")))
            for k in ks:
                model.pop(k, None)
        elif op == "delete_where":
            lo = rng.randrange(KEYSPACE)
            delete_where(spark, t, (F.col("k") >= lo) & (F.col("v") >= 500.0))
            model = {k: vt for k, vt in model.items() if not (k >= lo and vt[0] >= 500.0)}
        elif op == "compact":
            compact_table(spark, t)
        elif op == "restore":
            # ROLLBACK to a random retained version (r10): the model
            # reverts to its recorded historical state, and the feed
            # check below pins the restore's logged changes as the exact
            # reverse diff (restore-to-head is a legal no-op)
            from anglerfish_spark.sources.manifest_table import restore_table

            u = rng.randrange(1, v_before + 1)
            restore_table(spark, t, u)
            model = dict(history[u - 1])
        else:
            compact_deletes(spark, t)

        got = _state(spark, t)
        assert got == model, f"trial {trial} step {step} op {op}: {got} != {model}"
        # per-commit logged feed == independent diff for every new version
        v_after = current_version(t)
        for u in range(v_before, v_after):
            logged, mode = table_changes(spark, t, u, u + 1, mode="auto", net=True)
            diff, _ = table_changes(spark, t, u, u + 1, mode="diff")
            a = sorted(str(tuple(r)) for r in logged.collect())
            b = sorted(str(tuple(r)) for r in diff.collect())
            assert a == b, f"trial {trial} step {step} op {op} v{u}->{u+1}: feed != diff"
        while len(history) < v_after:
            history.append(dict(model))

    # time travel: three random historical versions equal their recorded model
    for v in rng.sample(range(1, len(history) + 1), min(3, len(history))):
        got = {r.k: (r.v, r.tag) for r in snapshot(spark, t, v).collect()}
        assert got == history[v - 1], f"trial {trial} time travel v{v}"


PART_SPECS = [
    [{"transform": "identity", "col": "tag"}],
    [{"transform": "truncate", "col": "k", "w": 7}],
    [{"transform": "bucket", "col": "k", "n": 3}],
    [{"transform": "identity", "col": "tag"}, {"transform": "bucket", "col": "k", "n": 2}],
]


@pytest.mark.parametrize("trial", range(3))
def test_partitioned_write_sequences_match_model(spark, tmp_path, trial):
    """r10 extension (VERDICT r9 #6): the same differential over a
    PARTITIONED table — random spec, partitioned appends, a mid-sequence
    spec EVOLUTION, keyed writes — asserting after every op that the
    snapshot equals the model, a partition-pruned point read equals the
    model's filter (pruning exactness: never loses a row), and the
    logged feed equals the independent diff."""
    from anglerfish_spark.sources.manifest_table import commit
    from anglerfish_spark.sources.partitioning import (
        append_partitioned,
        evolve_partition_spec,
        stage_files_partitioned,
    )
    from anglerfish_spark.sources.read_path import read_table

    rng = random.Random(SEED + 777 + trial)
    t = str(tmp_path / f"pt{trial}")
    model: dict[int, tuple] = {}

    def batch_rows(n):
        return [
            (rng.randrange(KEYSPACE), float(rng.randrange(1000)), rng.choice("abc"))
            for _ in range(n)
        ]

    rows = list({r[0]: r for r in batch_rows(12)}.values())
    spec = rng.choice(PART_SPECS)
    files, parts, filled = stage_files_partitioned(spark, _df(spark, rows), t, spec)
    commit(
        t, files, expected_version=0, partition_spec=filled, partitions=parts,
        changes={"inserted": [{"files": files, "schema": None}], "deleted": []},
    )
    model.update({k: (v, tag) for k, v, tag in rows})
    history: list[dict] = [dict(model)]  # model state per committed version

    def check(step, op):
        got = _state(spark, t)
        assert got == model, f"trial {trial} step {step} op {op}: {got} != {model}"
        # pruning exactness on a point probe (never loses a row) + a tag
        # slice; files_kept bounded by total
        k0 = rng.randrange(KEYSPACE)
        df, rep = read_table(spark, t, predicates={"k": (k0, k0)})
        want = sorted((k, vt[0], vt[1]) for k, vt in model.items() if k == k0)
        assert sorted(tuple(r) for r in df.collect()) == want, f"{op} probe k={k0}"
        assert rep["files_kept"] <= rep["files_total"]
        tg = rng.choice("abc")
        df2, _ = read_table(spark, t, predicates={"tag": (tg, tg)})
        want2 = sorted((k, vt[0], vt[1]) for k, vt in model.items() if vt[1] == tg)
        assert sorted(tuple(r) for r in df2.collect()) == want2, f"{op} probe tag={tg}"

    evolved = False
    for step in range(10):
        v_before = current_version(t)
        # r11 extension (VERDICT r10 #8): WAP stage+publish, OPTIMIZE
        # ZORDER, and RESTORE join the partitioned alphabet, with the
        # same pruning-exactness probe after every op
        ops = ["upsert", "merge_auto", "delete_keys", "delete_where",
               "append_part", "compact", "wap", "zorder", "restore"]
        if not evolved:
            ops.append("evolve_spec")
        op = rng.choice(ops)
        if op == "upsert":
            rows = list({r[0]: r for r in batch_rows(rng.randrange(1, 6))}.values())
            upsert(spark, t, _df(spark, rows), ["k"])
            for k, v, tag in rows:
                model[k] = (v, tag)
        elif op == "merge_auto":
            rows = list({r[0]: r for r in batch_rows(rng.randrange(1, 6))}.values())
            merge_into(
                spark, t, _df(spark, rows), ["k"],
                when_matched_update={"v": "s.v", "tag": "s.tag"},
                when_matched_delete="s.tag = 'a'",
                insert_not_matched=True, mode="auto",
            )
            for k, v, tag in rows:
                if k in model and tag == "a":
                    del model[k]
                else:
                    model[k] = (v, tag)
        elif op == "delete_keys":
            ks = sorted({rng.randrange(KEYSPACE) for _ in range(rng.randrange(1, 4))})
            delete_keys(spark, t, "k",
                        local_df(spark, [(k,) for k in ks], ["k"]).select(F.col("k").cast("long")))
            for k in ks:
                model.pop(k, None)
        elif op == "delete_where":
            lo = rng.randrange(KEYSPACE)
            delete_where(spark, t, (F.col("k") >= lo) & (F.col("v") >= 500.0))
            model = {k: vt for k, vt in model.items() if not (k >= lo and vt[0] >= 500.0)}
        elif op == "append_part":
            # fresh keys only (an append must not duplicate)
            rows = [(k + KEYSPACE * (step + 2), v, tag) for k, v, tag in batch_rows(3)]
            rows = list({r[0]: r for r in rows}.values())
            append_partitioned(spark, t, _df(spark, rows), txn_id=f"ap-{trial}-{step}")
            for k, v, tag in rows:
                model[k] = (v, tag)
        elif op == "evolve_spec":
            new = rng.choice([s for s in PART_SPECS if s != spec])
            evolve_partition_spec(spark, t, new)
            evolved = True
        elif op == "wap":
            # write-audit-publish: staged rows must be INVISIBLE until
            # publish (fresh keys only — a publish is an append)
            from anglerfish_spark.sources.wap import publish_staged, stage_append

            rows = [(k + KEYSPACE * 100 * (step + 2), v, tag)
                    for k, v, tag in batch_rows(3)]
            rows = list({r[0]: r for r in rows}.values())
            stage_append(spark, t, _df(spark, rows), f"wap-{trial}-{step}")
            assert _state(spark, t) == model, "staged rows leaked before publish"
            publish_staged(spark, t, f"wap-{trial}-{step}")
            for k, v, tag in rows:
                model[k] = (v, tag)
        elif op == "zorder":
            from anglerfish_spark.sources.skipping import zorder_compact

            zorder_compact(spark, t, ["k", "v"], n_files=4)  # logical no-op
        elif op == "restore":
            from anglerfish_spark.sources.manifest_table import restore_table

            u = rng.randrange(1, v_before + 1)
            restore_table(spark, t, u)
            model = dict(history[u - 1])
        else:
            compact_table(spark, t)
        check(step, op)
        v_after = current_version(t)
        for u in range(v_before, v_after):
            logged, _ = table_changes(spark, t, u, u + 1, mode="auto", net=True)
            diff, _ = table_changes(spark, t, u, u + 1, mode="diff")
            a = sorted(str(tuple(r)) for r in logged.collect())
            b = sorted(str(tuple(r)) for r in diff.collect())
            assert a == b, f"trial {trial} step {step} op {op} v{u}->{u+1}"
        while len(history) < v_after:
            history.append(dict(model))

    # backfill windows (VERDICT r9 #6): the whole history drained into a
    # mirror at two window sizes must equal the final model state
    from anglerfish_spark.streaming.table_feed import backfill_feed_apply

    for w in (1, 3):
        mirror = str(tmp_path / f"m{trial}_{w}")
        backfill_feed_apply(spark, t, mirror, ["k"], window=w)
        got = {r.k: (r.v, r.tag) for r in snapshot(spark, mirror).collect()}
        assert got == model, f"trial {trial} backfill window={w}"
