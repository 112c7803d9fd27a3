"""OCF source/sink: python-level round-trip + third-party interop — files
written by the engine must be readable by the reference's own runtime
(org.apache.avro, on Spark's classpath), the I1-I5 interop check."""

from __future__ import annotations

import json
import os
import tempfile

from anglerfish_spark.sources.avro_ocf import decode_ocf, encode_ocf

SCHEMA = '{"type":"record","name":"r","fields":[{"name":"k","type":"long"},{"name":"s","type":"string"}]}'
VALUES = [{"k": 1, "s": "a"}, {"k": -300, "s": "héllo"}, {"k": 2**40, "s": ""}]


def test_python_roundtrip():
    blob = encode_ocf(VALUES, SCHEMA)
    assert decode_ocf(blob) == VALUES


def test_empty_file():
    assert decode_ocf(encode_ocf([], SCHEMA)) == []


def test_java_avro_reads_our_files(spark):
    """The JVM Avro DataFileReader (the library the reference builds on)
    must parse files produced by the engine byte-for-byte."""
    blob = encode_ocf(VALUES, SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.avro")
        with open(path, "wb") as f:
            f.write(blob)
        jvm = spark._jvm
        reader = jvm.org.apache.avro.generic.GenericDatumReader()
        dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(path), reader)
        got_schema = json.loads(dfr.getSchema().toString())
        assert got_schema["name"] == "r"
        assert [f["name"] for f in got_schema["fields"]] == ["k", "s"]
        records = []
        while dfr.hasNext():
            records.append(json.loads(dfr.next().toString()))
        dfr.close()
        assert records == VALUES


class TestMultiVersionRead:
    """One reader schema over a directory of files written under different
    schema versions — the registry consumption pattern."""

    V1 = '{"type":"record","name":"ev","fields":[{"name":"k","type":"int"}]}'
    V2 = """
    {"type":"record","name":"ev","fields":[
      {"name":"knum","type":"long","aliases":["k"]},
      {"name":"tag","type":"string","default":"v2"}
    ]}
    """
    READER = """
    {"type":"record","name":"ev","fields":[
      {"name":"knum","type":"double","aliases":["k"]},
      {"name":"tag","type":"string","default":"legacy"}
    ]}
    """

    def test_reader_schema_unifies_versions(self, spark, tmp_path):
        import json as _json

        from anglerfish_spark.codec.pydecode import decode_datum
        from anglerfish_spark.schema import parse_schema
        from anglerfish_spark.sources.avro_ocf import encode_ocf, read_avro_ocf

        d = str(tmp_path / "ocf")
        import os

        os.makedirs(d)
        ps1, ps2 = parse_schema(self.V1), parse_schema(self.V2)
        with open(f"{d}/v1.avro", "wb") as f:
            f.write(encode_ocf(
                [decode_datum(ps1.root, {"k": 1}, ps1.env),
                 decode_datum(ps1.root, {"k": 2}, ps1.env)], self.V1))
        with open(f"{d}/v2.avro", "wb") as f:
            f.write(encode_ocf(
                [decode_datum(ps2.root, {"knum": 30, "tag": "new"}, ps2.env)], self.V2))

        out = read_avro_ocf(spark, f"{d}/*.avro", reader_schema=self.READER)
        rows = sorted(
            (_json.loads(r["value"]) for r in out.collect()), key=lambda v: v["knum"]
        )
        assert rows == [
            {"knum": 1.0, "tag": "legacy"},
            {"knum": 2.0, "tag": "legacy"},
            {"knum": 30.0, "tag": "new"},
        ]
        # every value is a float after promotion (int/long → double)
        assert all(isinstance(v["knum"], float) for v in rows)
