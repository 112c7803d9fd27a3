"""Avro ``.avsc`` schema parser.

Engine analogue of the reference's ``parseSchema`` / ``parseAvroSchemaAlgebra``
(reference data/avro/AvroJsonFAlgebras.scala:725-754 and :107-528).  The
reference folds a JSON pattern-functor with a context-passing attribute
grammar to cope with lazy infinite schemas; here schemas are finite Python
dicts, so plain recursion with an explicit environment suffices — the
*semantics* carried over are:

* the environment is seeded with the 8 primitive names
  (reference :736-745) and extended by every named type discovered
  (reference :377,403,465);
* a reference to an enclosing, still-being-parsed record becomes an
  :class:`AvroRecursionRef` via the ``parents`` set (reference :257-277);
* an unknown reference raises :class:`UnknownSchemaReferenceError` listing
  the known names (reference :273);
* field defaults are kept as raw Avro-JSON literals, decoded later against
  the full field type (reference :501-506 / D8 semantics);
* nested unions are rejected (reference :557).

Where the reference is demonstrably broken (enum ``symbols`` and ``aliases``
arrays can never parse — SURVEY.md §2.1 'known-broken'), the engine follows
the Avro spec and documents the divergence here.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Any

from ..errors import (
    RefinementError,
    UnexpectedJsonTypeError,
    UnknownFieldError,
    UnknownSchemaReferenceError,
    UnknownSortOrderError,
)
from .model import (
    PRIMITIVES,
    AvroArray,
    AvroEnum,
    AvroField,
    AvroFixed,
    AvroMap,
    AvroPrimitive,
    AvroRecord,
    AvroRecursionRef,
    AvroType,
    AvroUnion,
    LOGICAL_CARRIERS,
    LogicalType,
    Primitive,
    SortOrder,
)
from .names import construct_fqn, split_fqn, validate_name

COMPLEX_KINDS = ("record", "enum", "fixed", "array", "map")


def _fixed_capacity(length: int) -> int:
    """Max decimal precision a fixed of ``length`` bytes can hold (spec:
    ``floor(log10(2^(8L-1) - 1))`` — every value of that many digits must
    be representable, so the partial top digit does not count)."""
    return len(str((1 << (8 * length - 1)) - 1)) - 1 if length > 0 else 0


def _validated_decimal(obj: dict, max_precision: int | None) -> LogicalType | None:
    """Validated decimal annotation, or None if invalid (the spec's
    fallback: an ill-formed logical type is ignored, the carrier used)."""
    precision, scale = obj.get("precision"), obj.get("scale", 0)
    ok = (
        isinstance(precision, int)
        and not isinstance(precision, bool)
        and isinstance(scale, int)
        and not isinstance(scale, bool)
        and precision > 0
        and 0 <= scale <= precision
        and (max_precision is None or precision <= max_precision)
    )
    return LogicalType("decimal", precision=precision, scale=scale) if ok else None


def _validated_logical(obj: dict, carrier: Primitive) -> LogicalType | None:
    """Validated logical annotation for a primitive carrier, or None
    (unknown names and carrier mismatches are ignored per spec)."""
    name = obj.get("logicalType")
    if not isinstance(name, str) or carrier not in LOGICAL_CARRIERS.get(name, ()):
        return None
    if name == "decimal":
        return _validated_decimal(obj, max_precision=None)
    return LogicalType(name)


@dataclass(frozen=True)
class ParsedSchema:
    """Parse result: the root type plus the named-type environment."""

    root: AvroType
    env: dict[str, AvroType]


class _Parser:
    def __init__(self) -> None:
        self.env: dict[str, AvroType] = {}
        self.parents: set[str] = set()  # FQNs of records currently open

    # -- name resolution ----------------------------------------------------

    def resolve(self, name: str, namespace: str | None) -> AvroType:
        if name in PRIMITIVES:
            return PRIMITIVES[name]
        candidates = [name]
        if "." not in name and namespace:
            candidates.append(construct_fqn(namespace, name))
        for cand in candidates:
            if cand in self.parents:
                return AvroRecursionRef(cand)
            if cand in self.env:
                return self.env[cand]
        raise UnknownSchemaReferenceError(name, list(self.env) + list(self.parents))

    def register(self, fqn: str, t: AvroType) -> None:
        if fqn in self.env or fqn in self.parents:
            raise RefinementError(f"duplicate definition of named type {fqn!r}")
        self.env[fqn] = t

    # -- recursive descent ---------------------------------------------------

    def parse_type(self, node: Any, namespace: str | None) -> AvroType:
        if isinstance(node, str):
            return self.resolve(node, namespace)
        if isinstance(node, list):
            members = tuple(self.parse_type(m, namespace) for m in node)
            return AvroUnion(members)
        if isinstance(node, dict):
            return self.parse_object(node, namespace)
        raise UnexpectedJsonTypeError(
            f"JSON {type(node).__name__} is not a valid schema node: {node!r}"
        )

    def parse_object(self, obj: dict, namespace: str | None) -> AvroType:
        if "type" not in obj:
            raise UnknownFieldError(f"schema object missing 'type': {sorted(obj)}")
        kind = obj["type"]
        if kind == "array":
            if "items" not in obj:
                raise UnknownFieldError("array schema missing 'items'")
            return AvroArray(self.parse_type(obj["items"], namespace))
        if kind == "map":
            if "values" not in obj:
                raise UnknownFieldError("map schema missing 'values'")
            return AvroMap(self.parse_type(obj["values"], namespace))
        if kind == "enum":
            return self.parse_enum(obj, namespace)
        if kind == "fixed":
            return self.parse_fixed(obj, namespace)
        if kind == "record":
            return self.parse_record(obj, namespace)
        # {"type": <schema>} wrapper (spec-legal), e.g. {"type": "string"});
        # a primitive wrapper may carry a logicalType annotation
        t = self.parse_type(kind, namespace)
        if isinstance(t, AvroPrimitive):
            logical = _validated_logical(obj, t.kind)
            if logical is not None:
                return AvroPrimitive(t.kind, logical=logical)
        return t

    # -- named types ---------------------------------------------------------

    def _named_parts(self, obj: dict, enclosing_ns: str | None) -> tuple[str, str | None]:
        if "name" not in obj:
            raise UnknownFieldError(f"named type missing 'name': {sorted(obj)}")
        name = obj["name"]
        if not isinstance(name, str):
            raise UnexpectedJsonTypeError(f"'name' must be a string, got {name!r}")
        if "." in name:  # a dotted name carries its own namespace (spec)
            ns, name = split_fqn(name)
        else:
            ns = obj.get("namespace", enclosing_ns)
        validate_name(name)
        return name, ns

    @staticmethod
    def _aliases(obj: dict) -> tuple[str, ...]:
        """Alias arrays, per spec (the reference's alias parsing can never
        succeed — 'Aliases' intermediate consumed but never produced,
        reference :363-365 vs :283-332; engine implements the intent)."""
        raw = obj.get("aliases", [])
        if not isinstance(raw, list) or not all(isinstance(a, str) for a in raw):
            raise UnexpectedJsonTypeError(f"'aliases' must be an array of strings: {raw!r}")
        return tuple(raw)

    def parse_enum(self, obj: dict, namespace: str | None) -> AvroEnum:
        name, ns = self._named_parts(obj, namespace)
        raw = obj.get("symbols")
        if not isinstance(raw, list) or not all(isinstance(s, str) for s in raw):
            raise UnexpectedJsonTypeError(f"enum 'symbols' must be an array of strings: {raw!r}")
        t = AvroEnum(
            name=name,
            namespace=ns,
            symbols=tuple(raw),
            doc=obj.get("doc"),
            aliases=self._aliases(obj),
        )
        self.register(t.fqn, t)
        return t

    def parse_fixed(self, obj: dict, namespace: str | None) -> AvroFixed:
        name, ns = self._named_parts(obj, namespace)
        length = obj.get("size", obj.get("length"))
        if not isinstance(length, int) or isinstance(length, bool):
            raise UnexpectedJsonTypeError(f"fixed 'size' must be an integer: {length!r}")
        logical = None
        if obj.get("logicalType") == "decimal":
            logical = _validated_decimal(obj, max_precision=_fixed_capacity(length))
        t = AvroFixed(
            name=name, namespace=ns, length=length, aliases=self._aliases(obj), logical=logical
        )
        self.register(t.fqn, t)
        return t

    def parse_record(self, obj: dict, namespace: str | None) -> AvroRecord:
        name, ns = self._named_parts(obj, namespace)
        fqn = construct_fqn(ns, name)
        if fqn in self.env or fqn in self.parents:
            raise RefinementError(f"duplicate definition of named type {fqn!r}")
        raw_fields = obj.get("fields")
        if not isinstance(raw_fields, list):
            raise UnexpectedJsonTypeError(f"record 'fields' must be an array: {raw_fields!r}")
        # open the record: self/forward references inside fields become
        # AvroRecursionRef (reference parents-set mechanics, :257-277)
        self.parents.add(fqn)
        try:
            fields = tuple(self.parse_field(f, ns) for f in raw_fields)
        finally:
            self.parents.discard(fqn)
        t = AvroRecord(
            name=name,
            namespace=ns,
            doc=obj.get("doc"),
            aliases=self._aliases(obj),
            fields=fields,
        )
        self.register(fqn, t)
        return t

    def parse_field(self, obj: Any, namespace: str | None) -> AvroField:
        if not isinstance(obj, dict):
            raise UnexpectedJsonTypeError(f"record field must be an object: {obj!r}")
        if "name" not in obj:
            raise UnknownFieldError(f"record field missing 'name': {sorted(obj)}")
        if "type" not in obj:
            raise UnknownFieldError(f"record field {obj['name']!r} missing 'type'")
        order_raw = obj.get("order", "ascending")
        try:
            order = SortOrder(order_raw)
        except ValueError:
            raise UnknownSortOrderError(
                f"field {obj['name']!r}: order must be ascending/descending/ignore, got {order_raw!r}"
            ) from None
        return AvroField(
            name=obj["name"],
            type=self.parse_type(obj["type"], namespace),
            doc=obj.get("doc"),
            default=obj.get("default"),
            has_default="default" in obj,
            order=order,
            aliases=self._aliases(obj),
        )


def parse_schema(source: str | dict | list) -> ParsedSchema:
    """Parse an ``.avsc`` document (JSON text or already-loaded JSON).

    Engine analogue of reference ``parseSchema`` (AvroJsonFAlgebras.scala:725-754).
    """
    if isinstance(source, str):
        try:
            node = json.loads(source)
        except json.JSONDecodeError as exc:
            raise UnexpectedJsonTypeError(f"schema is not valid JSON: {exc}") from exc
    else:
        node = source
    p = _Parser()
    root = p.parse_type(node, None)
    return ParsedSchema(root=root, env=dict(p.env))
