"""r14-opt differential suite: ``pydecode.compile_decoder`` (the
schema-compiled strict Avro-JSON datum decoder) vs the interpreted
:class:`pydecode.Decoder` reference twin.

The permissive decode UDFs surface ``{ExceptionType}@{path}`` as
oracle-checked output, so the compiled decoder must match the reference
on exception TYPE and MESSAGE, not only on decoded values.  Coverage:
every schema node kind (primitives with and without logical types,
enum, fixed, array, map, multi-branch unions incl. an ambiguous one,
records with defaults, recursion to the depth bound) and a seeded
mutation fuzz over valid datums.
"""

from __future__ import annotations

import base64
import copy
import json
import random

import pytest

from anglerfish_spark.codec.pydecode import Decoder, compile_decoder
from anglerfish_spark.schema.parser import parse_schema

WIDE_SCHEMA = """
{"type":"record","name":"R","namespace":"t","fields":[
  {"name":"a","type":"int"},
  {"name":"l","type":"long","default":9},
  {"name":"f","type":"float","default":0.5},
  {"name":"dd","type":"double","default":0.1},
  {"name":"bo","type":"boolean","default":true},
  {"name":"s","type":"string","default":"x"},
  {"name":"by","type":"bytes","default":""},
  {"name":"b","type":["null","string"],"default":null},
  {"name":"c","type":{"type":"array","items":"double"},"default":[]},
  {"name":"m","type":{"type":"map","values":"long"},"default":{}},
  {"name":"u","type":["int","string","bytes"],"default":{"int":1}},
  {"name":"e","type":{"type":"enum","name":"E","symbols":["X","Y"]},"default":"X"},
  {"name":"fx","type":{"type":"fixed","name":"Fx","size":2},"default":"YWE="},
  {"name":"dec","type":{"type":"bytes","logicalType":"decimal","precision":6,"scale":2},
   "default":"AA=="},
  {"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"},"default":0},
  {"name":"dt","type":{"type":"int","logicalType":"date"},"default":0},
  {"name":"uu","type":{"type":"string","logicalType":"uuid"},
   "default":"00000000-0000-0000-0000-000000000000"},
  {"name":"nested","type":{"type":"record","name":"N","fields":[
     {"name":"k","type":"string"},
     {"name":"v","type":["null","double"],"default":null}]},
   "default":{"k":"d"}},
  {"name":"tail","type":["null","R"],"default":null}
]}
"""


def _outcome(fn, value):
    try:
        return ("ok", fn(value))
    except Exception as exc:  # noqa: BLE001 - identity check needs everything
        return ("err", type(exc).__name__, str(exc))


def _pair(schema_str):
    ps = parse_schema(schema_str)
    dec = Decoder(ps.env)
    compiled = compile_decoder(ps.root, ps.env)
    return ps, (lambda v: dec.decode(ps.root, v)), compiled


def _assert_same(ref, cmp_, value, label=""):
    r1, r2 = _outcome(ref, value), _outcome(cmp_, value)
    assert r1 == r2, f"{label}: {json.dumps(value, default=str)[:120]}\n ref={r1}\n cmp={r2}"


class TestCompiledPydecodeR14Opt:
    def test_structured_cases(self):
        _, ref, cmp_ = _pair(WIDE_SCHEMA)
        b64 = lambda b: base64.b64encode(b).decode()  # noqa: E731
        cases = [
            {"a": 1},
            {"a": 1, "l": 2**62, "f": 0.25, "dd": 1e100, "bo": False, "s": "é",
             "by": b64(b"\x00\xff"), "b": {"string": "x"},
             "c": [1.5, -0.25], "m": {"k": 7, "": -1},
             "u": {"bytes": b64(b"zz")}, "e": "Y", "fx": b64(b"ab"),
             "dec": b64(b"\x01\x00"), "ts": 123456789, "dt": 19000,
             "uu": "123e4567-e89b-12d3-a456-426614174000",
             "nested": {"k": "a", "v": {"double": 2.5}},
             "tail": {"t.R": {"a": 2, "tail": {"t.R": {"a": 3}}}}},
            {"a": 1, "u": {"string": "s"}},
            {"a": 1, "u": {"int": -5}},
            # error battery: one per check the reference makes
            {"a": True}, {"a": 1.0}, {"a": 2**31}, {"a": -(2**31) - 1},
            {"a": 2**64}, {"a": "1"},
            {"a": 1, "l": 2**63}, {"a": 1, "l": True},
            {"a": 1, "f": 0.1}, {"a": 1, "f": 1}, {"a": 1, "f": True},
            {"a": 1, "dd": 7}, {"a": 1, "dd": True},
            {"a": 1, "bo": 1}, {"a": 1, "s": 5}, {"a": 1, "by": "!!!"},
            {"a": 1, "by": 0},
            {}, {"a": 1, "zz": 2}, {"a": 1, "b": "bare"},
            {"a": 1, "b": {"string": "x", "int": 1}}, {"a": 1, "b": {}},
            {"a": 1, "u": {"double": 1.0}}, {"a": 1, "u": None},
            {"a": 1, "u": 5}, {"a": 1, "e": "Z"}, {"a": 1, "e": 3},
            {"a": 1, "fx": b64(b"abc")}, {"a": 1, "fx": "%%"},
            {"a": 1, "c": "nope"}, {"a": 1, "c": [1.5, "x"]},
            {"a": 1, "c": {"0": 1.0}}, {"a": 1, "m": [1]},
            {"a": 1, "m": {"k": 1.5}}, {"a": 1, "dec": "*"},
            {"a": 1, "ts": "0"}, {"a": 1, "dt": 2**40},
            {"a": 1, "uu": "not-a-uuid"},
            {"a": 1, "nested": {"k": "a", "v": 1.0}},
            {"a": 1, "nested": {"v": None}},
            {"a": 1, "nested": []},
            {"a": 1, "tail": {"R": {"a": 2}}},  # unqualified key: no such branch
            None, [], "str", 7, True,
        ]
        for v in cases:
            _assert_same(ref, cmp_, v, "structured")

    def test_recursion_depth_boundary(self):
        _, ref, cmp_ = _pair(WIDE_SCHEMA)
        for depth in (1, 9, 10, 11, 14):
            top = cur = {"a": 0}
            for i in range(depth):
                nxt = {"a": i + 1}
                cur["tail"] = {"t.R": nxt}
                cur = nxt
            _assert_same(ref, cmp_, top, f"depth={depth}")

    def test_compiled_reusable_after_error(self):
        """Depth state must unwind on errors too: a failing decode may
        not poison the next call (the reference's try/finally)."""
        _, ref, cmp_ = _pair(WIDE_SCHEMA)
        bad = {"a": 1, "tail": {"t.R": {"a": "boom"}}}
        good = {"a": 1, "tail": {"t.R": {"a": 2}}}
        for _ in range(3):
            _assert_same(ref, cmp_, bad, "bad-then-good")
            _assert_same(ref, cmp_, good, "bad-then-good")

    def test_ambiguous_union_branch(self):
        # distinct record branches: exercises the key -> branch routing,
        # the no-such-branch error, and a nested failure inside a branch
        schema = """
        {"type":"record","name":"A","fields":[
          {"name":"u","type":[
            {"type":"record","name":"B","fields":[{"name":"x","type":"int"}]},
            {"type":"record","name":"C","fields":[{"name":"x","type":"int"}]}
          ]}
        ]}
        """
        _, ref, cmp_ = _pair(schema)
        for v in (
            {"u": {"B": {"x": 1}}},
            {"u": {"C": {"x": 2}}},
            {"u": {"D": {"x": 3}}},
            {"u": {"B": {"x": "bad"}}},
        ):
            _assert_same(ref, cmp_, v, "union-branches")


    def test_invalid_default_error_identity(self):
        """A record default the reference cannot decode (D8 decodes the
        default against the FULL field type) must raise identically from
        the compiled path, at decode time, per use."""
        schema = """
        {"type":"record","name":"Bad","fields":[
          {"name":"a","type":"int"},
          {"name":"u","type":["int","string"],"default":1}
        ]}
        """
        _, ref, cmp_ = _pair(schema)
        for _ in range(2):
            _assert_same(ref, cmp_, {"a": 1}, "invalid-default")
            _assert_same(ref, cmp_, {"a": 1, "u": {"int": 2}}, "invalid-default")

    def test_mutation_fuzz(self):
        ps, ref, cmp_ = _pair(WIDE_SCHEMA)
        rng = random.Random(20260818)
        b64 = lambda b: base64.b64encode(b).decode()  # noqa: E731
        base = {
            "a": 1, "l": 5, "f": 0.5, "dd": 2.25, "bo": True, "s": "ab",
            "by": b64(b"xy"), "b": {"string": "q"}, "c": [1.0, 2.5],
            "m": {"k1": 1, "k2": 2}, "u": {"int": 3}, "e": "X",
            "fx": b64(b"zz"), "dec": b64(b"\x05"), "ts": 1000, "dt": 100,
            "uu": "123e4567-e89b-12d3-a456-426614174000",
            "nested": {"k": "n", "v": None},
            "tail": {"t.R": {"a": 2}},
        }
        junk = [None, True, False, 0, 1, -1, 2**31, 2**63, 2**70, 0.1, 0.5,
                float(2**40), "s", "", "!!!", [], [1], {}, {"x": 1},
                {"string": "v"}, {"int": 1}, {"long": 1}, "Z",
                b64(b"abc"), {"R": {"a": 1}}, {"t.R": {"a": 1}}, {"t.R": None}, [1.0, "x"],
                {"k": 0.5}, {"k": "v"}, 3.5]

        def mutate(doc):
            d = copy.deepcopy(doc)
            for _ in range(rng.randint(1, 3)):
                op = rng.random()
                if op < 0.15:
                    # drop a field (may hit a required one)
                    ks = list(d)
                    if ks:
                        d.pop(rng.choice(ks))
                elif op < 0.3:
                    d[f"extra_{rng.randint(0, 3)}"] = rng.choice(junk)
                else:
                    k = rng.choice(list(base))
                    d[k] = rng.choice(junk)
            return d

        n_err = 0
        for i in range(4000):
            v = mutate(base) if i % 8 else copy.deepcopy(base)
            r1, r2 = _outcome(ref, v), _outcome(cmp_, v)
            assert r1 == r2, f"fuzz#{i}: {json.dumps(v, default=str)[:160]}\n ref={r1}\n cmp={r2}"
            if r1[0] == "err":
                n_err += 1
        # the fuzz must actually exercise both paths
        assert n_err > 1000
        assert n_err < 4000

    def test_dangling_ref_and_unknown_nodes(self):
        ps = parse_schema(WIDE_SCHEMA)
        # empty env: recursion refs dangle at decode time in BOTH paths
        dec = Decoder({})
        cmp_ = compile_decoder(ps.root, {})
        v = {"a": 1, "tail": {"t.R": {"a": 2}}}
        _assert_same(lambda x: dec.decode(ps.root, x), cmp_, v, "dangling")


@pytest.mark.parametrize("mode", ["strict", "permissive"])
def test_decode_json_python_matches_interpreted(spark, mode):
    """The mapInPandas seam end-to-end: decode_json_python (now compiled)
    must produce the same rows/errors the interpreted reference produced
    — pinned against a hand-run interpreted decode of the same texts."""
    from anglerfish_spark.codec.decoder import decode_json_python
    from anglerfish_spark.errors import DatumError

    ps = parse_schema(WIDE_SCHEMA)
    texts = [
        json.dumps({"a": 1}),
        json.dumps({"a": 2, "b": {"string": "x"}, "c": [0.5]}),
        json.dumps({"a": "bad"}),
        json.dumps({"a": 3, "zz": 1}),
        None,
    ]
    if mode == "strict":
        texts = [t for t in texts if t is None or '"bad"' not in t and '"zz"' not in t]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, j string")
    got = {
        r["id"]: (r["decoded"], r["_errors"])
        for r in decode_json_python(df, "j", WIDE_SCHEMA, mode=mode).collect()
    }
    dec = Decoder(ps.env)
    for i, t in enumerate(texts):
        if t is None:
            assert got[i][0] is None and got[i][1] == []
            continue
        try:
            dec.decode(ps.root, json.loads(t))
            assert got[i][0] is not None and got[i][1] == []
        except DatumError as exc:
            assert mode == "permissive"
            assert got[i][0] is None
            assert got[i][1] == [f"{type(exc).__name__}@{str(exc).split(':')[0]}"]
