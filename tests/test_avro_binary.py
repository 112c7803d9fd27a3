"""Avro binary codec: spec edge cases + value round-trip property."""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from anglerfish_spark.codec.pydecode import decode_datum
from anglerfish_spark.functions.avro_binary import (
    BinaryCodec,
    read_long,
    write_long,
)
from anglerfish_spark.schema import parse_schema

from .test_codec import F2_PRIMS, F2_OK
from .test_schema import F1_LINKED_LIST, F3_KITCHEN_SINK


class TestVarint:
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    @settings(max_examples=200, deadline=None)
    def test_roundtrip(self, n):
        out = io.BytesIO()
        write_long(out, n)
        got, pos = read_long(out.getvalue(), 0)
        assert got == n and pos == len(out.getvalue())

    def test_known_encodings(self):
        # Avro spec examples: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01
        for n, enc in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
                       (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01")]:
            out = io.BytesIO()
            write_long(out, n)
            assert out.getvalue() == enc, n


class TestValueRoundtrip:
    def test_f2_primitives(self):
        ps = parse_schema(F2_PRIMS)
        codec = BinaryCodec(ps)
        v = decode_datum(ps.root, F2_OK, ps.env)
        back = codec.decode(codec.encode(v))
        assert back["f_int"] == 42 and back["f_string"] == "hi"
        assert bytes(back["f_bytes"]) == b"\x01\x02\x03"
        assert back["f_float"] == 1.5 and back["f_double"] == 1.1

    def test_f3_kitchen_sink(self):
        ps = parse_schema(F3_KITCHEN_SINK)
        codec = BinaryCodec(ps)
        datum = {
            "color": "GREEN",
            "digest": "AAECAwQFBgcICQoLDA0ODw==",
            "tags": ["a", "b", "c"],
            "props": {"x": 1, "y": -2},
            "choice": {"ch.test.Color": "RED"},
            "renamed": -100,
        }
        v = decode_datum(ps.root, datum, ps.env)
        back = codec.decode(codec.encode(v))
        assert back["color"] == "GREEN"
        assert back["tags"] == ["a", "b", "c"]
        assert back["props"] == {"x": 1, "y": -2}
        assert back["choice"]["member_Color"] == "RED"
        assert back["renamed"] == -100
        # null branch + defaults
        v2 = decode_datum(ps.root, dict(datum, choice=None), ps.env)
        assert codec.decode(codec.encode(v2))["choice"] is None

    def test_f1_recursive(self):
        ps = parse_schema(F1_LINKED_LIST)
        codec = BinaryCodec(ps)
        datum = {"value": 1, "tail": {"foo": {"value": 2, "tail": None}}}
        v = decode_datum(ps.root, datum, ps.env)
        back = codec.decode(codec.encode(v))
        assert back["tail"]["value"] == 2 and back["tail"]["tail"] is None
