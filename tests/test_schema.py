"""Schema front-end tests over the FIXTURES.md corpus (F1-F4) plus the
round-trip congruence property the reference intended but never ran
(reference TestJavaImplementationCongruence.scala:16-25, commented out)."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from anglerfish_spark import errors as E
from anglerfish_spark.schema import (
    AvroEnum,
    AvroField,
    AvroFixed,
    AvroPrimitive,
    AvroRecord,
    AvroRecursionRef,
    AvroUnion,
    Primitive,
    parse_schema,
    to_avsc,
    to_json,
    to_struct_type,
    from_struct_type,
)

F1_LINKED_LIST = """
{"name": "foo", "type": "record", "fields": [
  {"name": "value", "type": "int"},
  {"name": "tail", "type": ["null", "foo"], "default": null}
]}
"""

F3_KITCHEN_SINK = """
{"name": "sink", "namespace": "ch.test", "type": "record", "doc": "kitchen sink",
 "aliases": ["old_sink"], "fields": [
  {"name": "color",  "type": {"type": "enum", "name": "Color",
                              "symbols": ["RED", "GREEN", "BLUE"]}},
  {"name": "digest", "type": {"type": "fixed", "name": "MD5", "size": 16}},
  {"name": "tags",   "type": {"type": "array", "items": "string"}, "default": []},
  {"name": "props",  "type": {"type": "map", "values": "long"}},
  {"name": "choice", "type": ["null", "int", "string", "Color"], "default": null},
  {"name": "renamed","type": "int", "aliases": ["old_name"], "order": "descending"}
]}
"""

F4_NAMED_REFS = """
{"name": "pair", "type": "record", "fields": [
  {"name": "a", "type": {"type": "record", "name": "Point", "fields": [
      {"name": "x", "type": "double"}, {"name": "y", "type": "double"}]}},
  {"name": "b", "type": "Point"}
]}
"""


class TestParse:
    def test_f1_recursive(self):
        ps = parse_schema(F1_LINKED_LIST)
        root = ps.root
        assert isinstance(root, AvroRecord) and root.name == "foo"
        tail = root.fields[1]
        assert isinstance(tail.type, AvroUnion)
        assert tail.type.members[1] == AvroRecursionRef("foo")
        assert tail.has_default and tail.default is None

    def test_f3_kitchen_sink(self):
        ps = parse_schema(F3_KITCHEN_SINK)
        root = ps.root
        assert root.fqn == "ch.test.sink"
        color, digest, tags, props, choice, renamed = root.fields
        assert isinstance(color.type, AvroEnum)
        # nested named types inherit the enclosing namespace (Avro spec)
        assert color.type.fqn == "ch.test.Color"
        assert color.type.symbols == ("RED", "GREEN", "BLUE")
        assert isinstance(digest.type, AvroFixed) and digest.type.length == 16
        assert choice.type.members[3] is color.type  # resolved by short name
        assert renamed.aliases == ("old_name",)
        assert renamed.order.value == "descending"
        assert root.aliases == ("old_sink",)
        # env carries all three named types
        assert set(ps.env) == {"ch.test.sink", "ch.test.Color", "ch.test.MD5"}

    def test_f4_named_reuse(self):
        ps = parse_schema(F4_NAMED_REFS)
        a, b = ps.root.fields
        assert b.type is a.type  # second use resolves to the same object

    def test_unknown_ref_lists_known(self):
        bad = F4_NAMED_REFS.replace('"type": "Point"}', '"type": "Point3"}')
        with pytest.raises(E.UnknownSchemaReferenceError) as ei:
            parse_schema(bad)
        assert "Point3" in str(ei.value)
        assert "Point" in str(ei.value.known)

    def test_errors(self):
        with pytest.raises(E.RefinementError):
            parse_schema('{"type":"record","name":"9bad","fields":[]}')
        with pytest.raises(E.UnknownSortOrderError):
            parse_schema(
                '{"type":"record","name":"r","fields":[{"name":"x","type":"int","order":"sideways"}]}'
            )
        with pytest.raises(E.RefinementError):  # nested union
            parse_schema('{"type":"record","name":"r","fields":[{"name":"x","type":[["int"]]}]}')
        with pytest.raises(E.RefinementError):  # empty enum
            parse_schema('{"type":"enum","name":"e","symbols":[]}')
        with pytest.raises(E.UnknownFieldError):  # missing items
            parse_schema('{"type":"array"}')
        with pytest.raises(E.RefinementError):  # duplicate definition
            parse_schema(
                '[{"type":"record","name":"d","fields":[]},{"type":"record","name":"d","fields":[]}]'
            )
        with pytest.raises(E.UnexpectedJsonTypeError):
            parse_schema("42")

    def test_type_wrapper_object(self):
        ps = parse_schema('{"type": {"type": "string"}}')
        assert ps.root == AvroPrimitive(Primitive.STRING)


class TestRoundtrip:
    def test_f1_f3_f4_roundtrip(self):
        for src in (F1_LINKED_LIST, F3_KITCHEN_SINK, F4_NAMED_REFS):
            t = parse_schema(src).root
            assert parse_schema(to_avsc(t)).root == t

    def test_printer_references_named_once(self):
        j = to_json(parse_schema(F3_KITCHEN_SINK).root)
        # 'Color' appears fully defined in field 0 and as a reference in 'choice'
        choice_type = j["fields"][4]["type"]
        assert choice_type == ["null", "int", "string", "ch.test.Color"]


class TestStructType:
    def test_f1_unroll_and_truncation(self):
        ps = parse_schema(F1_LINKED_LIST)
        st3 = to_struct_type(ps.root, ps.env, max_depth=3)
        # depth 1 = root; tail unrolls twice more, then truncates to null
        assert isinstance(st3, T.StructType)
        lvl2 = st3["tail"].dataType
        assert isinstance(lvl2, T.StructType)
        lvl3 = lvl2["tail"].dataType
        assert isinstance(lvl3, T.StructType)
        assert isinstance(lvl3["tail"].dataType, T.NullType)
        assert lvl3["tail"].metadata.get("anglerfish.recursion.truncated") is True
        # non-recursive field is required, recursive (null-union) nullable
        assert st3["value"].nullable is False
        assert st3["tail"].nullable is True

    def test_f3_spark_mapping(self):
        ps = parse_schema(F3_KITCHEN_SINK)
        st = to_struct_type(ps.root, ps.env)
        assert isinstance(st["color"].dataType, T.StringType)
        assert st["color"].metadata["anglerfish.enum.symbols"] == ["RED", "GREEN", "BLUE"]
        assert isinstance(st["digest"].dataType, T.BinaryType)
        assert st["digest"].metadata["anglerfish.fixed.length"] == 16
        assert st["tags"].dataType == T.ArrayType(T.StringType(), False)
        assert st["props"].dataType == T.MapType(T.StringType(), T.LongType(), False)
        choice = st["choice"]
        assert choice.nullable is True
        assert [f.name for f in choice.dataType.fields] == [
            "member_int",
            "member_string",
            "member_Color",
        ]
        assert st["choice"].metadata["anglerfish.union.branches"] == [
            "member_int",
            "member_string",
            "member_Color",
        ]
        assert json.loads(st["tags"].metadata["anglerfish.default.json"]) == []

    def test_export_roundtrip_simple(self):
        st = T.StructType(
            [
                T.StructField("a", T.LongType(), False),
                T.StructField("b", T.StringType(), True),
                T.StructField("c", T.ArrayType(T.DoubleType(), False), False),
            ]
        )
        avro = from_struct_type(st, "rec")
        back = to_struct_type(avro)
        assert [f.name for f in back.fields] == ["a", "b", "c"]
        assert back["b"].dataType == T.StringType()
        assert back["b"].nullable is True


# --- property: print∘parse == id over generated schemas ---------------------

_names = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,8}", fullmatch=True)
_prims = st.sampled_from(
    [Primitive.BOOLEAN, Primitive.INT, Primitive.LONG, Primitive.FLOAT,
     Primitive.DOUBLE, Primitive.BYTES, Primitive.STRING]
).map(AvroPrimitive)


def _types(depth: int) -> st.SearchStrategy:
    if depth <= 0:
        return _prims
    sub = _types(depth - 1)
    return st.one_of(
        _prims,
        st.builds(lambda i: __import__("anglerfish_spark.schema", fromlist=["AvroArray"]).AvroArray(i), sub),
        st.builds(lambda v: __import__("anglerfish_spark.schema", fromlist=["AvroMap"]).AvroMap(v), sub),
    )


_fields = st.lists(
    st.builds(lambda n, t: AvroField(name=n, type=t), _names, _types(2)),
    min_size=1,
    max_size=5,
    unique_by=lambda f: f.name,
)
_records = st.builds(
    lambda n, fs: AvroRecord(name=n, fields=tuple(fs)), _names, _fields
)


@settings(max_examples=50, deadline=None)
@given(_records)
def test_roundtrip_property(rec):
    assert parse_schema(to_avsc(rec)).root == rec
