"""Pure-Python strict Avro-JSON datum decoder — the reference semantics 1:1.

Engine analogue of ``parseDatum`` / ``parseAvroDatumAlgebra`` (reference
data/avro/AvroJsonFAlgebras.scala:715-723 and :567-709).  This is the
semantic ground truth for the expression-based decoder in ``decoder.py``
(the test suite runs them differentially) and doubles as the Pandas-UDF
fallback for schemas whose strictness checks exceed what fixed-path JSON
expressions can reach (deeply nested records inside arrays).

Decoded representation mirrors the target Spark schema produced by
``schema.spark_convert.to_struct_type``:

* records → dict (insertion-ordered, schema field order);
* multi-member unions → dict with exactly the chosen ``member_*`` key set,
  others ``None``; ``["null", T]`` unions → the bare value or None;
* bytes/fixed → ``bytes``; enum → the symbol string.

Numeric rules are D3 (reference :604-633): ints accepted for ``int`` iff
they fit int32 and for ``long`` iff int64 (beyond → UnrepresentableError);
doubles accepted for ``float`` only when the float32 round-trip is exact.
"""

from __future__ import annotations

import base64
import binascii
import math
import struct as _struct
from typing import Any

from ..errors import (
    ArrayError,
    DatumError,
    EnumError,
    FixedError,
    RecordError,
    UnexpectedTypeError,
    UnionError,
    UnionResolutionError,
    UnrepresentableError,
)
from ..schema.model import (
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
    Primitive,
    type_name,
)
from ..schema.spark_convert import union_field_names
from .logical import py_carrier_to_value

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1
INT64_MIN, INT64_MAX = -(2**63), 2**63 - 1


def _b64(value: Any, path: str) -> bytes:
    if not isinstance(value, str):
        raise UnexpectedTypeError(f"{path}: expected base64 string, got {type(value).__name__}")
    try:
        return base64.b64decode(value, validate=True)
    except (binascii.Error, ValueError) as exc:
        raise UnexpectedTypeError(f"{path}: invalid base64: {exc}") from exc


def _float_exact(value: float) -> bool:
    """True iff the double survives a float32 round-trip exactly
    (reference exactness rule, AvroJsonFAlgebras.scala:624-629)."""
    if math.isnan(value) or math.isinf(value):
        return True
    return _struct.unpack("f", _struct.pack("f", value))[0] == value


class Decoder:
    """Schema-directed strict decoder over already-json.loads'ed values."""

    def __init__(self, env: dict[str, AvroType], max_depth: int = 10):
        self.env = env
        self.max_depth = max_depth
        self._depth: dict[str, int] = {}

    # -- entry ---------------------------------------------------------------

    def decode(self, t: AvroType, value: Any, path: str = "$") -> Any:
        if isinstance(t, AvroRecursionRef):
            # expand one level (reference expandRecursiveReference, :530-533)
            target = self.env.get(t.fqn)
            if target is None:
                raise DatumError(f"{path}: dangling recursion ref {t.fqn!r}")
            if self._depth.get(t.fqn, 0) >= self.max_depth:
                raise UnrepresentableError(
                    f"{path}: datum exceeds recursion depth bound {self.max_depth} for {t.fqn!r}"
                )
            return self.decode(target, value, path)
        if isinstance(t, AvroPrimitive):
            out = self._prim(t.kind, value, path)
            if t.logical is not None:
                return py_carrier_to_value(t.logical, out, path)
            return out
        if isinstance(t, AvroEnum):
            if not isinstance(value, str):
                raise UnexpectedTypeError(f"{path}: enum expects string, got {type(value).__name__}")
            if value not in t.symbols:
                raise EnumError(f"{path}: {value!r} not in symbols {list(t.symbols)}")
            return value
        if isinstance(t, AvroFixed):
            raw = _b64(value, path)
            if len(raw) != t.length:
                raise FixedError(f"{path}: fixed {t.fqn} expects {t.length} bytes, got {len(raw)}")
            if t.logical is not None:  # decimal-annotated fixed
                return py_carrier_to_value(t.logical, raw, path)
            return raw
        if isinstance(t, AvroArray):
            if not isinstance(value, list):
                raise ArrayError(f"{path}: expected JSON array, got {type(value).__name__}")
            return [self.decode(t.items, v, f"{path}[{i}]") for i, v in enumerate(value)]
        if isinstance(t, AvroMap):
            if not isinstance(value, dict):
                raise UnexpectedTypeError(f"{path}: expected JSON object (map), got {type(value).__name__}")
            return {k: self.decode(t.values, v, f"{path}.{k}") for k, v in value.items()}
        if isinstance(t, AvroUnion):
            return self._union(t, value, path)
        if isinstance(t, AvroRecord):
            return self._record(t, value, path)
        raise DatumError(f"{path}: unexpected schema node {t!r}")

    # -- primitives (D3/D4/D9) ----------------------------------------------

    def _prim(self, kind: Primitive, value: Any, path: str) -> Any:
        if kind is Primitive.NULL:
            if value is not None:
                raise UnexpectedTypeError(f"{path}: expected null, got {type(value).__name__}")
            return None
        if kind is Primitive.BOOLEAN:
            if not isinstance(value, bool):
                raise UnexpectedTypeError(f"{path}: expected boolean, got {type(value).__name__}")
            return value
        if kind is Primitive.INT:
            self._require_integral(value, path)
            if not INT32_MIN <= value <= INT32_MAX:
                if INT64_MIN <= value <= INT64_MAX:
                    raise UnexpectedTypeError(f"{path}: {value} overflows int32")
                raise UnrepresentableError(f"{path}: {value} not representable as int")
            return value
        if kind is Primitive.LONG:
            self._require_integral(value, path)
            if not INT64_MIN <= value <= INT64_MAX:
                raise UnrepresentableError(f"{path}: {value} not representable as long")
            return value
        if kind is Primitive.FLOAT:
            if isinstance(value, bool) or not isinstance(value, float):
                raise UnexpectedTypeError(f"{path}: expected JSON double for float, got {value!r}")
            if not _float_exact(value):
                raise UnrepresentableError(
                    f"{path}: {value!r} is not exactly representable as float32"
                )
            return value
        if kind is Primitive.DOUBLE:
            if isinstance(value, bool) or not isinstance(value, float):
                raise UnexpectedTypeError(f"{path}: expected JSON double, got {value!r}")
            return value
        if kind is Primitive.BYTES:
            return _b64(value, path)
        if kind is Primitive.STRING:
            if not isinstance(value, str):
                raise UnexpectedTypeError(f"{path}: expected string, got {type(value).__name__}")
            return value
        raise DatumError(f"{path}: unhandled primitive {kind}")

    @staticmethod
    def _require_integral(value: Any, path: str) -> None:
        if isinstance(value, bool) or not isinstance(value, int):
            raise UnexpectedTypeError(f"{path}: expected JSON integer, got {value!r}")

    # -- union (D5 + S3 branch naming) ---------------------------------------

    def _union(self, u: AvroUnion, value: Any, path: str) -> Any:
        non_null = u.non_null_members
        multi = len(non_null) > 1
        if value is None:
            if not u.is_nullable:
                raise UnionError(f"{path}: null not permitted by union")
            return None
        if not isinstance(value, dict):
            raise UnionError(
                f"{path}: union datum must be null or a single-key object, got {value!r}"
            )
        if len(value) != 1:
            raise UnionError(f"{path}: union object must have exactly one key, got {sorted(value)}")
        (key, inner), = value.items()
        matches = [m for m in non_null if self._branch_key(m) == key]
        if not matches:
            raise UnionResolutionError(
                f"{path}: no union branch named {key!r}; "
                f"branches: {[self._branch_key(m) for m in non_null]}"
            )
        if len(matches) > 1:
            raise UnionResolutionError(f"{path}: ambiguous union branch {key!r}")
        member = matches[0]
        decoded = self.decode(member, inner, f"{path}.{key}")
        if not multi:
            return decoded
        # keys are the collision-qualified union_field_names — the same
        # names to_struct_type/as_avro_json use (bare names collide)
        names = union_field_names(u)
        out = dict.fromkeys(names)
        out[names[non_null.index(member)]] = decoded
        return out

    def _branch_key(self, m: AvroType) -> str:
        """Branch keys per reference selectUnionMemberByName
        (AvroJsonFAlgebras.scala:536-565): primitives by type name, named
        types by FQN, 'array'/'map' literally."""
        return type_name(m)

    # -- record (D6/D8) ------------------------------------------------------

    def _record(self, r: AvroRecord, value: Any, path: str) -> Any:
        if not isinstance(value, dict):
            raise UnexpectedTypeError(f"{path}: expected JSON object, got {type(value).__name__}")
        extra = set(value) - {f.name for f in r.fields}
        if extra:
            raise RecordError(f"{path}: unexpected fields {sorted(extra)} for record {r.fqn}")
        n = self._depth.get(r.fqn, 0)
        self._depth[r.fqn] = n + 1
        try:
            out: dict[str, Any] = {}
            for f in r.fields:
                fpath = f"{path}.{f.name}"
                if f.name in value:
                    out[f.name] = self.decode(f.type, value[f.name], fpath)
                elif f.has_default:
                    # default decoded against the full field type (D8; the
                    # reference deviates from the Avro spec's
                    # "first-union-member" rule — we follow the reference)
                    out[f.name] = self.decode(f.type, f.default, fpath)
                else:
                    raise RecordError(f"{path}: missing required field {f.name!r} of {r.fqn}")
            return out
        finally:
            self._depth[r.fqn] = n


def decode_datum(
    t: AvroType,
    value: Any,
    env: dict[str, AvroType] | None = None,
    max_depth: int = 10,
) -> Any:
    """Decode one already-parsed JSON value against a schema, strictly."""
    return Decoder(env or {}, max_depth).decode(t, value)
