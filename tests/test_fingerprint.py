"""Schema fingerprint tests: Parsing Canonical Form + CRC-64-AVRO.

Differential-tested against ``org.apache.avro.SchemaNormalization`` from
the avro-core jar pyspark ships — the authoritative implementation of the
spec the module re-implements in Python.
"""

from __future__ import annotations

import pytest

from anglerfish_spark.schema.fingerprint import (
    parsing_canonical_form,
    rabin_fingerprint64,
    schema_fingerprint,
)

from .test_schema import F1_LINKED_LIST, F3_KITCHEN_SINK, F4_NAMED_REFS

CORPUS = {
    "int": '"int"',
    "int_object": '{"type": "int"}',
    "union": '["null", "string", "long"]',
    "array_of_map": '{"type": "array", "items": {"type": "map", "values": "bytes"}}',
    "f1_recursive": F1_LINKED_LIST,
    "f3_kitchen_sink": F3_KITCHEN_SINK,
    "f4_named_refs": F4_NAMED_REFS,
    "namespace_inherit": """
      {"name": "outer", "namespace": "com.example", "type": "record", "fields": [
        {"name": "inner", "type": {"type": "record", "name": "Inner", "fields": [
          {"name": "v", "type": "float"}]}}]}
    """,
}


class TestKnownVectors:
    def test_int_rabin(self):
        # Avro spec CRC-64-AVRO of '"int"' (cross-checked vs SchemaNormalization)
        assert rabin_fingerprint64(b'"int"') == 0x7275D51A3F395C8F

    def test_canonical_strips_and_orders(self):
        pcf = parsing_canonical_form(
            '{"type":"record","name":"x","namespace":"ns","fields":'
            '[{"name":"a","type":"int","doc":"d","default":0}]}'
        )
        assert pcf == '{"name":"ns.x","type":"record","fields":[{"name":"a","type":"int"}]}'

    def test_primitive_object_form_collapses(self):
        assert parsing_canonical_form('{"type": "int"}') == '"int"'
        assert parsing_canonical_form('"int"') == '"int"'

    def test_named_reuse_is_fullname_ref(self):
        pcf = parsing_canonical_form(F4_NAMED_REFS)
        assert pcf.count('"record"') == 2  # pair + one Point definition
        assert pcf.endswith('{"name":"b","type":"Point"}]}')

    def test_recursion_ref_is_fullname(self):
        pcf = parsing_canonical_form(F1_LINKED_LIST)
        assert '["null","foo"]' in pcf

    def test_fingerprint_algorithms(self):
        assert len(schema_fingerprint('"int"', "CRC-64-AVRO")) == 8
        assert len(schema_fingerprint('"int"', "MD5")) == 16
        assert len(schema_fingerprint('"int"', "SHA-256")) == 32
        with pytest.raises(ValueError):
            schema_fingerprint('"int"', "crc32")


class TestDifferentialVsJava:
    @pytest.fixture(scope="class")
    def java_norm(self, spark):
        jvm = spark._jvm
        try:
            jvm.java.lang.Class.forName("org.apache.avro.SchemaNormalization")
        except Exception:
            pytest.skip("avro-core not on classpath")
        return jvm

    @pytest.mark.parametrize("name", sorted(CORPUS))
    def test_canonical_matches_java(self, java_norm, name):
        avsc = CORPUS[name]
        parsed = java_norm.org.apache.avro.Schema.Parser().parse(avsc)
        expected = java_norm.org.apache.avro.SchemaNormalization.toParsingForm(parsed)
        assert parsing_canonical_form(avsc) == expected

    @pytest.mark.parametrize("name", sorted(CORPUS))
    def test_rabin_matches_java(self, java_norm, name):
        avsc = CORPUS[name]
        parsed = java_norm.org.apache.avro.Schema.Parser().parse(avsc)
        expected = (
            java_norm.org.apache.avro.SchemaNormalization.parsingFingerprint64(parsed)
            & 0xFFFFFFFFFFFFFFFF
        )
        ours = int.from_bytes(schema_fingerprint(avsc, "CRC-64-AVRO"), "little")
        assert ours == expected
