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
