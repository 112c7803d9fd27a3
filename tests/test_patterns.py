"""Spec fuzzer for the pattern API (VERDICT r5 #5): random PatternSpecs
and random event sequences, three implementations compared —

1. an INDEPENDENT pure-Python reference: build the runs relation, scan
   for consecutive role sequences (naive, obviously-correct);
2. the streaming automaton (PatternMachine), fed event-by-event and
   also split across simulated micro-batches at random boundaries;
3. the batch gaps-and-islands compilation, run on Spark.

The same differential strategy that caught the r5 bestBranch union bug,
applied to MATCH_RECOGNIZE.  Seed rotates via ANGLERFISH_FUZZ_SEED.
"""

from __future__ import annotations

import os
import random

import pytest

from anglerfish_spark.operators.patterns import (
    VIEW_CLICK_PURCHASE,
    PatternMachine,
    PatternSpec,
    PatternStep,
    match_pattern_batch,
    spec,
)

SEED = int(os.environ.get("ANGLERFISH_FUZZ_SEED", "61"))


def reference_match(types: list, p: PatternSpec) -> tuple:
    """Independent oracle: runs relation + naive role-sequence scan.
    Deliberately NOT the automaton — a separate derivation of the
    semantics (anchored scan over maximal same-type runs)."""
    runs: list[tuple] = []  # (typ, len)
    for t in types:
        if runs and runs[-1][0] == t:
            runs[-1] = (t, runs[-1][1] + 1)
        else:
            runs.append((t, 1))

    def role(typ):
        for i, s in enumerate(p.steps):
            if typ in s.events:
                return i
        return None

    k = len(p.steps)
    n = tot = mx = 0
    for a in range(len(runs) - k + 1):
        ok = True
        for j in range(k):
            typ, ln = runs[a + j]
            if role(typ) != j:
                ok = False
                break
            if p.steps[j].quantifier == "1" and j < k - 1 and ln != 1:
                ok = False
                break
        if ok:
            n += 1
            mlen = runs[a + p.measure_idx][1]
            tot += mlen
            mx = max(mx, mlen)
    return (n, tot, mx)


def machine_match(types: list, p: PatternSpec, chunks: list | None = None) -> tuple:
    m = PatternMachine(p)
    if chunks is None:
        for t in types:
            m.feed(t)
        return (m.n, m.tot, m.mx)
    # resume across simulated micro-batches through the state tuple
    state = None
    i = 0
    for c in chunks:
        m = PatternMachine(p, state)
        for t in types[i : i + c]:
            m.feed(t)
        state = m.state()
        i += c
    m = PatternMachine(p, state)
    for t in types[i:]:
        m.feed(t)
    return (m.n, m.tot, m.mx)


def random_spec(rng: random.Random, alphabet: list) -> PatternSpec:
    k = rng.randint(2, min(4, len(alphabet)))
    pool = list(alphabet)
    rng.shuffle(pool)
    steps = []
    pos = 0
    for i in range(k):
        width = rng.randint(1, 2) if len(pool) - pos > (k - i) else 1
        ev = frozenset(pool[pos : pos + width])
        pos += width
        steps.append(PatternStep(ev, rng.choice(["+", "+", "1"])))
    measure = rng.randrange(k - 1)
    return PatternSpec(tuple(steps), measure)


ALPHABET = ["a", "b", "c", "d", "e", "f"]


class TestPatternFuzzPure:
    """Machine vs independent reference, no Spark — hundreds of cases."""

    def test_machine_matches_reference(self):
        rng = random.Random(SEED)
        for case in range(400):
            p = random_spec(rng, ALPHABET)
            n_ev = rng.randint(0, 60)
            types = [rng.choice(ALPHABET) for _ in range(n_ev)]
            ref = reference_match(types, p)
            got = machine_match(types, p)
            assert got == ref, (case, p, "".join(types), got, ref)

    def test_machine_state_roundtrip_across_batches(self):
        rng = random.Random(SEED + 1)
        for case in range(200):
            p = random_spec(rng, ALPHABET)
            n_ev = rng.randint(1, 60)
            types = [rng.choice(ALPHABET) for _ in range(n_ev)]
            cuts = sorted(rng.sample(range(n_ev + 1), min(3, n_ev)))
            chunks = [b - a for a, b in zip([0] + cuts, cuts)]
            ref = reference_match(types, p)
            got = machine_match(types, p, chunks)
            assert got == ref, (case, p, "".join(types), chunks, got, ref)

    def test_original_pattern_examples(self):
        p = VIEW_CLICK_PURCHASE
        cases = [
            (["view", "click", "purchase"], (1, 1, 1)),
            (["view", "click", "click", "purchase"], (1, 2, 2)),
            (["view", "purchase"], (0, 0, 0)),
            (["click", "purchase"], (0, 0, 0)),
            (["view", "click", "view", "click", "purchase"], (1, 1, 1)),
            (
                ["view", "click", "purchase", "view", "click", "click", "purchase"],
                (2, 3, 2),
            ),
            (["view", "view", "click", "purchase"], (1, 1, 1)),
            (["view", "click", "other", "purchase"], (0, 0, 0)),
            (["view", "click", "purchase", "purchase"], (1, 1, 1)),
        ]
        for types, want in cases:
            assert machine_match(types, p) == want, types
            assert reference_match(types, p) == want, types

    def test_spec_validation(self):
        with pytest.raises(ValueError):
            spec("a")  # < 2 steps
        with pytest.raises(ValueError):
            spec("a", ("a", "+"))  # overlapping sets
        with pytest.raises(ValueError):
            spec("a", "b", measure_idx=1)  # measure on final step
        with pytest.raises(ValueError):
            PatternStep(frozenset({"a"}), "*")


class TestPatternFuzzSpark:
    """Batch compilation vs the same reference — fewer, bigger cases."""

    def _events_df(self, spark, rows):
        from anglerfish_spark.localdata import local_df

        return local_df(
            spark, rows, "user_id long, event_id long, ts long, event_type string"
        )

    def test_batch_matches_reference(self, spark):
        rng = random.Random(SEED + 2)
        for case in range(6):
            p = random_spec(rng, ALPHABET)
            rows = []
            per_user = {}
            for u in range(8):
                n_ev = rng.randint(0, 40)
                types = [rng.choice(ALPHABET) for _ in range(n_ev)]
                per_user[u] = types
                for i, t in enumerate(types):
                    rows.append((u, i, i * 10, t))
            if not rows:
                continue
            got = {
                r["user_id"]: (r["n_matches"], r["total_len"], r["max_len"])
                for r in match_pattern_batch(
                    self._events_df(spark, rows), p, order=("ts", "event_id")
                ).collect()
            }
            want = {
                u: reference_match(t, p)
                for u, t in per_user.items()
                if reference_match(t, p)[0] >= 1
            }
            assert got == want, (case, p)

    def test_batch_equals_original_pattern_on_testdata(self, spark, sf_dir):
        """The spec-compiled batch plan reproduces the original hardcoded
        q_pattern_match results on real events data."""
        from anglerfish_spark.registry import all_queries

        qs = all_queries()
        df = qs["q_pattern_match"].fn(spark, sf_dir)
        rows = df.collect()
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        per_user = {}
        for r in (
            ev.select("user_id", "ts", "event_id", "event_type")
            .orderBy("user_id", "ts", "event_id")
            .collect()
        ):
            per_user.setdefault(r["user_id"], []).append(r["event_type"])
        want = {
            u: reference_match(t, VIEW_CLICK_PURCHASE) for u, t in per_user.items()
        }
        want = {u: v for u, v in want.items() if v[0] >= 1}
        got = {
            r["user_id"]: (r["n_matches"], r["total_clicks"], r["max_click_run"])
            for r in rows
        }
        assert got == want
