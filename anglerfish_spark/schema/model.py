"""The engine's Avro type tree.

Python re-expression of the reference's ``AvroType`` pattern functor
(reference data/avro/AvroData.scala:39-68) at its fixed point: a finite
immutable tree of dataclasses, with recursion expressed explicitly via
:class:`AvroRecursionRef` (the analogue of ``AvroRecursionType``,
AvroData.scala:59) instead of the reference's lazy ``Nu`` greatest fixed
point — schemas the parser produces are always finite, with back-references
for recursive records.

Field order is significant and preserved (the reference keeps fields in a
``ListMap``, AvroData.scala:53; enum symbols in a ``ListSet``,
AvroData.scala:54) — Python lists/tuples keep insertion order naturally.

Beyond reference scope (explicit TODO at reference AvroData.scala:17):
Avro *logical types* are supported per spec — a ``LogicalType`` annotation
riding on its carrier primitive/fixed.  The spec's fallback rule applies:
an invalid logicalType/carrier combination is IGNORED at parse time and the
underlying type used (Avro spec "Logical Types"); validation therefore
lives in the parser, and a constructed ``LogicalType`` is always valid for
its carrier.  Parsing Canonical Form strips logical attributes (spec
[STRIP]), so fingerprints are unaffected — differential-tested against
org.apache.avro.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Union

from ..errors import RefinementError
from .names import construct_fqn, validate_name, validate_namespace


class Primitive(str, Enum):
    """The 8 Avro primitives (reference AvroData.scala:41-49)."""

    NULL = "null"
    BOOLEAN = "boolean"
    INT = "int"
    LONG = "long"
    FLOAT = "float"
    DOUBLE = "double"
    BYTES = "bytes"
    STRING = "string"


class SortOrder(str, Enum):
    """Record-field sort order (reference AvroData.scala:65-68); default ASCENDING."""

    ASCENDING = "ascending"
    DESCENDING = "descending"
    IGNORE = "ignore"


@dataclass(frozen=True)
class LogicalType:
    """Validated logical-type annotation (Avro spec "Logical Types").

    ``precision``/``scale`` are only meaningful for ``decimal``; the parser
    guarantees carrier compatibility and decimal bounds before attaching.
    """

    name: str
    precision: int | None = None
    scale: int | None = None


#: logical-type name → carrier primitives it may annotate (decimal may also
#: annotate fixed, handled separately)
LOGICAL_CARRIERS: dict[str, tuple[Primitive, ...]] = {
    "date": (Primitive.INT,),
    "time-millis": (Primitive.INT,),
    "time-micros": (Primitive.LONG,),
    "timestamp-millis": (Primitive.LONG,),
    "timestamp-micros": (Primitive.LONG,),
    "local-timestamp-millis": (Primitive.LONG,),
    "local-timestamp-micros": (Primitive.LONG,),
    "uuid": (Primitive.STRING,),
    "decimal": (Primitive.BYTES,),
}


@dataclass(frozen=True)
class AvroPrimitive:
    kind: Primitive
    logical: LogicalType | None = None

    @property
    def type_name(self) -> str:
        return self.kind.value


@dataclass(frozen=True)
class AvroArray:
    items: "AvroType"


@dataclass(frozen=True)
class AvroMap:
    """String-keyed map (reference AvroData.scala:56)."""

    values: "AvroType"


@dataclass(frozen=True)
class AvroUnion:
    members: tuple["AvroType", ...]

    def __post_init__(self):
        if any(isinstance(m, AvroUnion) for m in self.members):
            raise RefinementError("nested unions are not permitted (Avro spec)")

    @property
    def is_nullable(self) -> bool:
        return any(isinstance(m, AvroPrimitive) and m.kind is Primitive.NULL for m in self.members)

    @property
    def non_null_members(self) -> tuple["AvroType", ...]:
        return tuple(
            m for m in self.members if not (isinstance(m, AvroPrimitive) and m.kind is Primitive.NULL)
        )


@dataclass(frozen=True)
class AvroField:
    """Record field + metadata (reference AvroRecordFieldMetaData, AvroData.scala:62).

    ``default`` holds the raw Avro-JSON literal (decoded lazily against the
    field type, mirroring the reference's already-decoded defaults at
    AvroJsonFAlgebras.scala:501-506); ``NO_DEFAULT`` distinguishes "no
    default given" from "default is JSON null".
    """

    name: str
    type: "AvroType"
    doc: str | None = None
    default: Any = None
    has_default: bool = False
    order: SortOrder = SortOrder.ASCENDING
    aliases: tuple[str, ...] = ()

    def __post_init__(self):
        validate_name(self.name)
        for a in self.aliases:
            validate_name(a)


@dataclass(frozen=True)
class AvroRecord:
    name: str
    namespace: str | None = None
    doc: str | None = None
    aliases: tuple[str, ...] = ()
    fields: tuple[AvroField, ...] = ()

    def __post_init__(self):
        validate_name(self.name)
        if self.namespace is not None:
            validate_namespace(self.namespace)
        seen = set()
        for f in self.fields:
            if f.name in seen:
                raise RefinementError(f"duplicate field name {f.name!r} in record {self.name!r}")
            seen.add(f.name)

    @property
    def fqn(self) -> str:
        return construct_fqn(self.namespace, self.name)


@dataclass(frozen=True)
class AvroEnum:
    """Named enum with an ordered, non-empty, duplicate-free symbol list
    (reference AvroData.scala:54; the reference's enum *parser* is broken —
    SURVEY.md §2.1 'known-broken' — the engine implements the spec)."""

    name: str
    symbols: tuple[str, ...]
    namespace: str | None = None
    doc: str | None = None
    aliases: tuple[str, ...] = ()

    def __post_init__(self):
        validate_name(self.name)
        if self.namespace is not None:
            validate_namespace(self.namespace)
        if not self.symbols:
            raise RefinementError(f"enum {self.name!r} must have at least one symbol")
        if len(set(self.symbols)) != len(self.symbols):
            raise RefinementError(f"enum {self.name!r} has duplicate symbols")
        for s in self.symbols:
            validate_name(s)

    @property
    def fqn(self) -> str:
        return construct_fqn(self.namespace, self.name)


@dataclass(frozen=True)
class AvroFixed:
    """Fixed-length binary (reference AvroData.scala:58); may carry a
    ``decimal`` logical annotation (precision bounded by the byte length)."""

    name: str
    length: int
    namespace: str | None = None
    aliases: tuple[str, ...] = ()
    logical: LogicalType | None = None

    def __post_init__(self):
        validate_name(self.name)
        if self.namespace is not None:
            validate_namespace(self.namespace)
        if self.length < 0:
            raise RefinementError(f"fixed {self.name!r} length must be >= 0")

    @property
    def fqn(self) -> str:
        return construct_fqn(self.namespace, self.name)


@dataclass(frozen=True)
class AvroRecursionRef:
    """Back-reference to an enclosing named type (reference
    AvroRecursionType, AvroData.scala:59): breaks cycles so the tree stays
    finite; resolved through the schema environment."""

    fqn: str


AvroType = Union[
    AvroPrimitive, AvroArray, AvroMap, AvroUnion, AvroRecord, AvroEnum, AvroFixed, AvroRecursionRef
]

NamedType = (AvroRecord, AvroEnum, AvroFixed)

#: singletons for convenience
NULL = AvroPrimitive(Primitive.NULL)
BOOLEAN = AvroPrimitive(Primitive.BOOLEAN)
INT = AvroPrimitive(Primitive.INT)
LONG = AvroPrimitive(Primitive.LONG)
FLOAT = AvroPrimitive(Primitive.FLOAT)
DOUBLE = AvroPrimitive(Primitive.DOUBLE)
BYTES = AvroPrimitive(Primitive.BYTES)
STRING = AvroPrimitive(Primitive.STRING)

PRIMITIVES: dict[str, AvroPrimitive] = {p.kind.value: p for p in (NULL, BOOLEAN, INT, LONG, FLOAT, DOUBLE, BYTES, STRING)}


def type_name(t: AvroType) -> str:
    """Union-branch key for a type (reference selectUnionMemberByName,
    AvroJsonFAlgebras.scala:536-565): primitives by type name, named types
    by FQN, array/map by the literal strings 'array'/'map'."""
    if isinstance(t, AvroPrimitive):
        return t.type_name
    if isinstance(t, AvroArray):
        return "array"
    if isinstance(t, AvroMap):
        return "map"
    if isinstance(t, NamedType):
        return t.fqn
    if isinstance(t, AvroRecursionRef):
        return t.fqn
    raise TypeError(f"unexpected type {t!r}")
