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
             "compact", "compact_deletes"]
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
