"""Avro type tree → ``.avsc`` JSON printer.

Engine analogue of the reference's export fold ``avroTypeToSchema`` /
``avroTypeToGenericSchema`` (reference
data/avro/AvroGenericInteropFAlgebras.scala:296-376 and :62-71): named types
are emitted in full on first occurrence and by FQN reference afterwards
(the reference threads a ``Map[String, Schema]`` through the fold for the
same purpose); recursion back-references print as their FQN, which is what
keeps the output finite (the reference instead truncates its lazy ``Nu``
knots before folding, :63-68).

``print → parse`` is the identity on the type tree — the congruence
property the reference intended to test but left commented out
(TestJavaImplementationCongruence.scala:16-25); our test suite enforces it.
"""

from __future__ import annotations

import json
from typing import Any

from .model import (
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
    SortOrder,
)


def _field_json(f: AvroField, seen: set[str]) -> dict:
    out: dict[str, Any] = {"name": f.name, "type": _type_json(f.type, seen)}
    if f.doc is not None:
        out["doc"] = f.doc
    if f.has_default:
        out["default"] = f.default
    if f.order is not SortOrder.ASCENDING:
        out["order"] = f.order.value
    if f.aliases:
        out["aliases"] = list(f.aliases)
    return out


def _logical_attrs(t) -> dict:
    out: dict[str, Any] = {"logicalType": t.logical.name}
    if t.logical.name == "decimal":
        out["precision"] = t.logical.precision
        if t.logical.scale:
            out["scale"] = t.logical.scale
    return out


def _type_json(t: AvroType, seen: set[str]) -> Any:
    if isinstance(t, AvroPrimitive):
        if t.logical is not None:
            return {"type": t.type_name, **_logical_attrs(t)}
        return t.type_name
    if isinstance(t, AvroRecursionRef):
        return t.fqn
    if isinstance(t, AvroArray):
        return {"type": "array", "items": _type_json(t.items, seen)}
    if isinstance(t, AvroMap):
        return {"type": "map", "values": _type_json(t.values, seen)}
    if isinstance(t, AvroUnion):
        return [_type_json(m, seen) for m in t.members]
    # named types: full definition once, FQN reference afterwards
    if t.fqn in seen:
        return t.fqn
    seen.add(t.fqn)
    if isinstance(t, AvroEnum):
        out: dict[str, Any] = {"type": "enum", "name": t.name, "symbols": list(t.symbols)}
        if t.namespace:
            out["namespace"] = t.namespace
        if t.doc is not None:
            out["doc"] = t.doc
        if t.aliases:
            out["aliases"] = list(t.aliases)
        return out
    if isinstance(t, AvroFixed):
        out = {"type": "fixed", "name": t.name, "size": t.length}
        if t.namespace:
            out["namespace"] = t.namespace
        if t.aliases:
            out["aliases"] = list(t.aliases)
        if t.logical is not None:
            out.update(_logical_attrs(t))
        return out
    if isinstance(t, AvroRecord):
        out = {"type": "record", "name": t.name}
        if t.namespace:
            out["namespace"] = t.namespace
        if t.doc is not None:
            out["doc"] = t.doc
        if t.aliases:
            out["aliases"] = list(t.aliases)
        out["fields"] = [_field_json(f, seen) for f in t.fields]
        return out
    raise TypeError(f"unexpected type {t!r}")


def to_json(t: AvroType) -> Any:
    """Type tree → avsc-shaped JSON value."""
    return _type_json(t, set())


def to_avsc(t: AvroType, indent: int | None = None) -> str:
    """Type tree → avsc JSON text."""
    return json.dumps(to_json(t), indent=indent)
