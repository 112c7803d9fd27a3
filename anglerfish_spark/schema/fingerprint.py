"""Avro schema fingerprints: Parsing Canonical Form + CRC-64-AVRO.

The reference's roadmap targets schema-registry workflows
(/root/reference/README.md:24 "Schema Registry source support"); registries
identify schemas by the fingerprint of their Parsing Canonical Form
(Avro spec, "Schema Fingerprints").  This module implements both on the
engine's schema model:

* :func:`parsing_canonical_form` — the spec's PCF transformation
  ([STRIP] non-parsing attributes, [FULLNAMES], [ORDER] canonical key
  order, [WHITESPACE] none); subsequent uses of a named type (including
  recursion back-references) emit the fullname string, as the spec's
  one-definition rule requires.
* :func:`rabin_fingerprint64` — the spec's CRC-64-AVRO function
  (polynomial table seeded from ``EMPTY = 0xc15d213aa4d7a795``).
* :func:`schema_fingerprint` — fingerprint bytes for the registry-standard
  algorithms (CRC-64-AVRO, MD5, SHA-256).

Differential-tested against ``org.apache.avro.SchemaNormalization`` (the
avro-core jar pyspark ships) in tests/test_fingerprint.py.
"""

from __future__ import annotations

import hashlib
import json

from .model import (
    AvroArray,
    AvroEnum,
    AvroFixed,
    AvroMap,
    AvroPrimitive,
    AvroRecord,
    AvroRecursionRef,
    AvroType,
    AvroUnion,
)
from .parser import ParsedSchema, parse_schema

#: CRC-64-AVRO seed/polynomial (Avro spec, "Schema Fingerprints")
_EMPTY64 = 0xC15D213AA4D7A795
_MASK64 = 0xFFFFFFFFFFFFFFFF

_FP_TABLE: list[int] | None = None


def _fp_table() -> list[int]:
    global _FP_TABLE
    if _FP_TABLE is None:
        table = []
        for i in range(256):
            fp = i
            for _ in range(8):
                fp = (fp >> 1) ^ (_EMPTY64 & -(fp & 1) & _MASK64)
            table.append(fp)
        _FP_TABLE = table
    return _FP_TABLE


def rabin_fingerprint64(data: bytes) -> int:
    """CRC-64-AVRO of ``data``, as an unsigned 64-bit integer."""
    table = _fp_table()
    fp = _EMPTY64
    for b in data:
        fp = (fp >> 8) ^ table[(fp ^ b) & 0xFF]
    return fp


def _canon(t: AvroType, seen: set[str]) -> str:
    if isinstance(t, AvroPrimitive):
        return json.dumps(t.type_name)
    if isinstance(t, AvroRecursionRef):
        return json.dumps(t.fqn)
    if isinstance(t, AvroUnion):
        return "[" + ",".join(_canon(m, seen) for m in t.members) + "]"
    if isinstance(t, AvroArray):
        return '{"type":"array","items":' + _canon(t.items, seen) + "}"
    if isinstance(t, AvroMap):
        return '{"type":"map","values":' + _canon(t.values, seen) + "}"
    # named types: first use defines, later uses reference by fullname
    fqn = t.fqn
    if fqn in seen:
        return json.dumps(fqn)
    seen.add(fqn)
    name = json.dumps(fqn)
    if isinstance(t, AvroEnum):
        symbols = ",".join(json.dumps(s) for s in t.symbols)
        return f'{{"name":{name},"type":"enum","symbols":[{symbols}]}}'
    if isinstance(t, AvroFixed):
        return f'{{"name":{name},"type":"fixed","size":{t.length}}}'
    if isinstance(t, AvroRecord):
        fields = ",".join(
            f'{{"name":{json.dumps(f.name)},"type":{_canon(f.type, seen)}}}' for f in t.fields
        )
        return f'{{"name":{name},"type":"record","fields":[{fields}]}}'
    raise TypeError(f"cannot canonicalize {t!r}")


def parsing_canonical_form(schema: ParsedSchema | AvroType | str) -> str:
    """Parsing Canonical Form (Avro spec) of a schema."""
    if isinstance(schema, str):
        schema = parse_schema(schema)
    root = schema.root if isinstance(schema, ParsedSchema) else schema
    return _canon(root, set())


def schema_fingerprint(
    schema: ParsedSchema | AvroType | str, algorithm: str = "CRC-64-AVRO"
) -> bytes:
    """Fingerprint of a schema's Parsing Canonical Form.

    ``algorithm`` is one of the registry-standard names ``CRC-64-AVRO``
    (8 bytes, little-endian per the spec's single-object encoding),
    ``MD5``, ``SHA-256``.
    """
    data = parsing_canonical_form(schema).encode("utf-8")
    alg = algorithm.upper()
    if alg == "CRC-64-AVRO":
        return rabin_fingerprint64(data).to_bytes(8, "little")
    if alg == "MD5":
        return hashlib.md5(data).digest()
    if alg == "SHA-256":
        return hashlib.sha256(data).digest()
    raise ValueError(f"unknown fingerprint algorithm {algorithm!r}")
