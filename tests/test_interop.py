"""I4/I5 generic-object interop bridge (codec/interop.py).

Differential strategy mirrors the binary codec's: the bridge's tagging is
validated by round-tripping through the pure-Python strict decoder (the
semantic ground truth), plus the congruence property the reference
intended but left commented out (TestJavaImplementationCongruence.scala:
16-25): ``tag ∘ untag = id`` on decoded representations.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from anglerfish_spark.codec.interop import (
    dataframe_to_objects,
    objects_to_dataframe,
    tag_generic,
    to_generic,
)
from anglerfish_spark.codec.pydecode import decode_datum
from anglerfish_spark.errors import RecordError, UnionResolutionError
from anglerfish_spark.schema import parse_schema

UNION_SCHEMA = """
{"type":"record","name":"R","fields":[
  {"name":"v","type":["null","int","long","float","double","string","boolean"]}
]}
"""


def _roundtrip(schema_json: str, obj):
    ps = parse_schema(schema_json)
    tagged = tag_generic(ps.root, obj, ps.env)
    decoded = decode_datum(ps.root, tagged, ps.env)
    return to_generic(ps.root, decoded, ps.env)


class TestRuntimeUnionMatch:
    """I4 reverse-match semantics (AvroGenericInteropFAlgebras.scala:228-286)
    with D3 narrowing for Python's unified numeric types."""

    def _branch(self, v):
        ps = parse_schema(UNION_SCHEMA)
        tagged = tag_generic(ps.root, {"v": v}, ps.env)
        return None if tagged["v"] is None else next(iter(tagged["v"]))

    def test_bool_before_int(self):
        assert self._branch(True) == "boolean"

    def test_int32_narrows_to_int(self):
        assert self._branch(42) == "int"

    def test_int64_overflows_to_long(self):
        assert self._branch(2**40) == "long"

    def test_float32_exact_is_float(self):
        assert self._branch(1.5) == "float"

    def test_float32_inexact_is_double(self):
        assert self._branch(1.1) == "double"

    def test_str_is_string(self):
        assert self._branch("x") == "string"

    def test_null_branch(self):
        assert self._branch(None) is None

    def test_no_match_raises(self):
        ps = parse_schema(UNION_SCHEMA)
        with pytest.raises(UnionResolutionError):
            tag_generic(ps.root, {"v": b"bytes-not-in-union"}, ps.env)

    def test_record_vs_map_by_shape(self):
        schema = """
        {"type":"record","name":"R","fields":[
          {"name":"v","type":[
            {"type":"record","name":"P","fields":[
              {"name":"x","type":"int"},{"name":"y","type":"int"}]},
            {"type":"map","values":"int"}
          ]}
        ]}
        """
        ps = parse_schema(schema)
        t1 = tag_generic(ps.root, {"v": {"x": 1, "y": 2}}, ps.env)
        assert next(iter(t1["v"])) == "P"  # field-shape match → record, by FQN
        t2 = tag_generic(ps.root, {"v": {"x": 1, "z": 9}}, ps.env)
        assert next(iter(t2["v"])) == "map"  # unknown key → not P → map


class TestCongruence:
    """untag(decode(tag(x))) == x over representative objects."""

    @pytest.mark.parametrize(
        "obj",
        [
            {"v": None},
            {"v": 42},
            {"v": 2**40},
            {"v": 1.5},
            {"v": 1.1},
            {"v": "hello"},
            {"v": True},
        ],
    )
    def test_union_values(self, obj):
        assert _roundtrip(UNION_SCHEMA, obj) == obj

    def test_nested_kitchen_sink(self):
        schema = """
        {"type":"record","name":"K","namespace":"t","fields":[
          {"name":"b","type":"bytes"},
          {"name":"fx","type":{"type":"fixed","name":"F8","size":8}},
          {"name":"e","type":{"type":"enum","name":"E","symbols":["A","B"]}},
          {"name":"arr","type":{"type":"array","items":["null","int"]}},
          {"name":"m","type":{"type":"map","values":"string"}},
          {"name":"child","type":["null",{"type":"record","name":"C","fields":[
            {"name":"n","type":"long"}]}]}
        ]}
        """
        obj = {
            "b": b"\x01\x02",
            "fx": b"12345678",
            "e": "B",
            "arr": [1, None, 3],
            "m": {"k": "v"},
            "child": {"n": 7},
        }
        assert _roundtrip(schema, obj) == obj

    def test_logical_semantic_values(self):
        schema = """
        {"type":"record","name":"L","fields":[
          {"name":"d","type":{"type":"int","logicalType":"date"}},
          {"name":"ts","type":{"type":"long","logicalType":"timestamp-micros"}},
          {"name":"amt","type":{"type":"bytes","logicalType":"decimal",
                                "precision":10,"scale":2}}
        ]}
        """
        obj = {
            "d": dt.date(2024, 2, 29),
            "ts": dt.datetime(2024, 2, 29, 12, 30, 45, 123456),
            "amt": Decimal("-12345.67"),
        }
        assert _roundtrip(schema, obj) == obj

    def test_extra_field_strictness(self):
        """D6 raised at tag time with the engine error class — passing
        extras through would hit json.dumps with a bare TypeError for
        non-JSON-serializable values."""
        ps = parse_schema(UNION_SCHEMA)
        with pytest.raises(RecordError):
            tag_generic(ps.root, {"v": 1, "oops": 2}, ps.env)
        with pytest.raises(RecordError):  # non-JSON extra: same error class
            tag_generic(ps.root, {"v": 1, "blob": b"\x00"}, ps.env)


class TestDataFrameBridge:
    def test_objects_roundtrip_through_spark(self, spark):
        schema = """
        {"type":"record","name":"O","fields":[
          {"name":"id","type":"long"},
          {"name":"payload","type":["null","int","string"]}
        ]}
        """
        objs = [
            {"id": 1, "payload": 10},
            {"id": 2, "payload": "xyz"},
            {"id": 3, "payload": None},
        ]
        df = objects_to_dataframe(spark, objs, schema)
        assert [f.name for f in df.schema.fields] == ["id", "payload"]
        back = dataframe_to_objects(df.orderBy("id"), schema)
        assert back == objs


# --- property: congruence over generated flat records -----------------------

import json as _json

from hypothesis import given, settings
from hypothesis import strategies as st

_PROP_SCHEMA = _json.dumps(
    {
        "type": "record",
        "name": "rec",
        "fields": [
            {"name": "f_bool", "type": "boolean"},
            {"name": "f_int", "type": "int"},
            {"name": "f_long", "type": "long"},
            {"name": "f_double", "type": "double"},
            {"name": "f_str", "type": "string"},
            {"name": "f_opt", "type": ["null", "long"]},
            {"name": "f_union", "type": ["null", "long", "string", "boolean"]},
        ],
    }
)

_gen_obj = st.fixed_dictionaries(
    {
        "f_bool": st.booleans(),
        "f_int": st.integers(min_value=-(2**31), max_value=2**31 - 1),
        "f_long": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "f_double": st.floats(allow_nan=False, allow_infinity=False),
        "f_str": st.text(max_size=8),
        "f_opt": st.one_of(st.none(), st.integers(-(2**40), 2**40)),
        # untagged multi-union value: branch must be recovered at runtime
        "f_union": st.one_of(
            st.none(),
            st.integers(-(2**62), 2**62),
            st.text(max_size=5),
            st.booleans(),
        ),
    }
)


@given(_gen_obj)
@settings(max_examples=100, deadline=None)
def test_congruence_property(obj):
    """tag → strict decode → untag is the identity on valid generic
    objects, including runtime-matched multi-union branches."""
    assert _roundtrip(_PROP_SCHEMA, obj) == obj


class TestMismatchedRuntimeType:
    """ADVICE r3: a type-mismatched value on a logical-less field (datetime
    where long is declared) used to surface as a bare TypeError from
    json.dumps; it must be a DatumError naming the field path."""

    SCHEMA = """
    {"type":"record","name":"m","fields":[
      {"name":"k","type":"long"},
      {"name":"nested","type":{"type":"record","name":"n","fields":[
        {"name":"w","type":"long"}]}}
    ]}
    """

    def test_datetime_on_plain_long_raises_datum_error(self, spark):
        import datetime

        import pytest

        from anglerfish_spark.codec.interop import objects_to_dataframe
        from anglerfish_spark.errors import DatumError

        objs = [{"k": 1, "nested": {"w": datetime.datetime(2020, 1, 1)}}]
        with pytest.raises(DatumError, match=r"datetime at \$\.nested\.w"):
            objects_to_dataframe(spark, objs, self.SCHEMA)
