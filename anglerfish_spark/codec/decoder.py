"""Expression-based strict JSON decoder (the JVM fast path).

Decodes a JSON-text column against a parsed Avro schema with the
reference's strict semantics (D1-D9, SURVEY.md §2.1), entirely with
built-in Catalyst expressions — ``from_json`` does the typed parse and a
composed validation layer supplies the strictness ``FAILFAST`` alone cannot
express:

* extra/missing record fields via ``json_object_keys`` on the raw text
  (reference D6: extra JSON fields are an error, :684,688);
* enum domain membership (D4), fixed base64 length (D4), union single-key
  tagged objects with branch-name resolution (D5/S3);
* D3 numeric rules: int32 range, int64 representability (checked against
  the raw digits, so overflow is caught even where the wire parse nulls),
  float32 exactness.

Everything stays inside whole-stage codegen — no Python UDF on this path.
The *wire schema* (what ``from_json`` parses) differs from the *target
schema* (what the engine returns): bytes/fixed/enum travel as strings,
unions as structs keyed by Avro branch names; the decoder then transforms
wire → target columns.

Raw-text strictness applies at full depth: record/union nodes parse their
raw text once into a ``map<string,string>`` object view, and arrays/maps
zip the typed parse with an ``array<string>`` / ``map<string,string>``
parse of the same text, so per-element raw text (and with it extra-field,
overflow, and wrong-type detection) is available inside collections too.
Quoted tokens at typed positions (``"123"`` for ``long``) are rejected on
both paths since r4 — the general path infers quotedness from
typed-wire-null + integral raw digits, the flat path from a staged
``try_parse_json`` variant probe (``schema_of_variant == 'STRING'``).
Residual divergences from ``pydecode``: a QUOTED beyond-int64 literal
classifies ``UnrepresentableError`` (pydecode: ``UnexpectedTypeError`` —
quotedness of overflowed digits is unobservable here), and past the
``RAW_RECURSION_LIMIT`` unroll depth validation falls back to wire-proxy
checks.

Error channel: ``mode="strict"`` raises on first violation (FAILFAST
analogue); ``mode="permissive"`` adds an ``_errors array<string>`` column
of ``Code@path`` entries (E1 taxonomy) and never raises.
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import InvalidParserStateError
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
from ..schema.parser import ParsedSchema, parse_schema
from ..schema.spark_convert import to_struct_type, union_field_names
from .logical import _let as _logical_let
from .pydecode import Decoder as _PyDecoder

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1
_B64_RE = r"^([A-Za-z0-9+/]{4})*([A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"

def _nullif_empty(c: Column) -> Column:
    """``nullif(c, '')`` without Spark 4's With-based NullIf, whose
    definition RewriteWithExpression inlines (duplicating ``c``) when the
    expression sits inside a higher-order-function lambda — see _cat."""
    return _logical_let(
        c, lambda v: F.when(v == "", F.lit(None).cast("string")).otherwise(v)
    )


def _empty_errs() -> Column:
    """No-error sentinel: the error channel is a nullable STRING of
    ';'-joined Code@path tags (null = clean).  Strings keep every
    combinator (when/concat_ws/nullif) inside whole-stage codegen —
    an array channel forces higher-order functions (array_compact →
    filter), which fall back to interpreted evaluation and cost ~10× on
    the hot path."""
    return F.lit(None).cast("string")


# ---------------------------------------------------------------------------
# wire schema: what from_json parses
# ---------------------------------------------------------------------------


def wire_struct_type(t: AvroType, env: dict[str, AvroType], max_depth: int = 10) -> T.DataType:
    """The from_json parse schema for an Avro type (strings for
    bytes/fixed/enum, widest numerics, branch-keyed structs for unions)."""
    return _Wire(env, max_depth).convert(t)


class _Wire:
    def __init__(self, env: dict[str, AvroType], max_depth: int):
        self.env = env
        self.max_depth = max_depth
        self.depth: dict[str, int] = {}

    def convert(self, t: AvroType) -> T.DataType:
        if isinstance(t, AvroPrimitive):
            return {
                Primitive.NULL: T.StringType(),  # checked via raw path / never non-null
                Primitive.BOOLEAN: T.BooleanType(),
                Primitive.INT: T.LongType(),
                Primitive.LONG: T.LongType(),
                Primitive.FLOAT: T.DoubleType(),
                Primitive.DOUBLE: T.DoubleType(),
                Primitive.BYTES: T.StringType(),
                Primitive.STRING: T.StringType(),
            }[t.kind]
        if isinstance(t, (AvroEnum, AvroFixed)):
            return T.StringType()
        if isinstance(t, AvroArray):
            return T.ArrayType(self.convert(t.items), containsNull=True)
        if isinstance(t, AvroMap):
            return T.MapType(T.StringType(), self.convert(t.values), valueContainsNull=True)
        if isinstance(t, AvroUnion):
            # Avro-JSON encodes every non-null union datum as a tagged
            # single-key object — even for ["null", T] (reference D5,
            # :657-667) — so the wire is always a branch-keyed struct
            non_null = t.non_null_members
            if len(non_null) == 0:
                return T.StringType()
            return T.StructType(
                [T.StructField(type_name(m), self.convert(m), True) for m in non_null]
            )
        if isinstance(t, AvroRecord):
            n = self.depth.get(t.fqn, 0)
            self.depth[t.fqn] = n + 1
            try:
                return T.StructType(
                    [T.StructField(f.name, self.convert(f.type), True) for f in t.fields]
                )
            finally:
                self.depth[t.fqn] = n
        if isinstance(t, AvroRecursionRef):
            if self.depth.get(t.fqn, 0) >= self.max_depth:
                return T.StringType()  # truncated branch; never decoded
            target = self.env.get(t.fqn)
            if target is None:
                raise InvalidParserStateError(f"dangling recursion ref {t.fqn!r}")
            return self.convert(target)
        raise InvalidParserStateError(f"unexpected type {t!r}")


# ---------------------------------------------------------------------------
# target-typed literals (for field defaults)
# ---------------------------------------------------------------------------


def _lit_value(value, dtype: T.DataType) -> Column:
    if value is None:
        return F.lit(None).cast(dtype)
    if isinstance(dtype, T.ArrayType):
        if not value:
            return F.array().cast(dtype)
        return F.array(*[_lit_value(v, dtype.elementType) for v in value]).cast(dtype)
    if isinstance(dtype, T.MapType):
        if not value:
            return F.map_from_arrays(F.array(), F.array()).cast(dtype)
        pairs = [x for k, v in value.items() for x in (F.lit(k), _lit_value(v, dtype.valueType))]
        return F.create_map(*pairs).cast(dtype)
    if isinstance(dtype, T.StructType):
        return F.struct(
            *[_lit_value(value.get(f.name), f.dataType).alias(f.name) for f in dtype.fields]
        )
    if isinstance(dtype, T.BinaryType):
        return F.lit(bytes(value))
    return F.lit(value).cast(dtype)


# ---------------------------------------------------------------------------
# wire → target transformation + validation expressions
# ---------------------------------------------------------------------------


class _ExprBuilder:
    """Builds (value, errors) column pairs per schema node.

    ``raw`` is the raw JSON *text* of the node (None inside collections,
    where per-element text is unaddressable); ``path`` is used only for
    error labels.  At record/union nodes the raw text is parsed ONCE into
    a ``map<string,string>`` (keys + per-field raw text + nested JSON text
    in a single pass) — the earlier per-check ``get_json_object`` calls
    re-parsed the document for every validation and dominated the decode
    cost.  The error channel is a nullable ';'-joined string (see
    ``_empty_errs``).
    """

    #: raw-text threading stops after this many re-entries of the same
    #: record (recursion): every level re-references its parent's object
    #: view several times, so the analysis-time expression tree grows
    #: ~6^level — beyond the limit validation falls back to wire-proxy
    #: checks (typed values still decode to the full max_depth unroll)
    RAW_RECURSION_LIMIT = 3

    def __init__(
        self,
        env: dict[str, AvroType],
        max_depth: int,
        root_map: Optional[Column] = None,
    ):
        self.env = env
        self.max_depth = max_depth
        self.root_map = root_map  # staged map<string,string> of the root text
        self.depth: dict[str, int] = {}

    # helpers ---------------------------------------------------------------

    @staticmethod
    def _err(cond: Column, code: str, path: str) -> Column:
        return F.when(cond, F.lit(f"{code}@{path}"))

    @staticmethod
    def _cat(*errs: Column) -> Column:
        errs = [e for e in errs if e is not None]
        if not errs:
            return _empty_errs()
        if len(errs) == 1:
            return errs[0]
        # concat_ws skips nulls; collapse the all-null case back to null.
        # NOT F.nullif: Spark 4's NullIf is RuntimeReplaceable via a `With`
        # whose definition RewriteWithExpression cannot hoist out of the
        # `_let` lambdas these trees nest in — it INLINES the first argument
        # (this whole concat of child errors) instead, doubling the error
        # tree per nesting level (measured: depth-5 recursive decode plan
        # 484k chars / 2558 CASE WHENs with nullif vs 16k / 53 with the
        # explicit let-bound form; SCALE.md #23).
        return _logical_let(
            F.concat_ws(";", *errs),
            lambda c: F.when(c == "", F.lit(None).cast("string")).otherwise(c),
        )

    def _obj_map(self, raw: Optional[Column], path: str) -> Optional[Column]:
        """One-parse object view: keys + raw value text per key."""
        if raw is None:
            return None
        if path == "$" and self.root_map is not None:
            return self.root_map
        return F.from_json(raw, T.MapType(T.StringType(), T.StringType()))

    # node dispatch ----------------------------------------------------------

    def build(
        self, t: AvroType, wire: Column, raw: Optional[Column], path: str,
        role: str = "both",
    ) -> tuple[Column, Column]:
        """Build the (value, errors) column pair for a schema node.

        ``role`` controls which slot the caller will actually use —
        ``"value"`` / ``"errs"`` traversals skip the other slot's
        construction at the let-bound nodes (records, unions, collections),
        so the per-column let-binding costs ONE Python traversal per
        column instead of doubling per nesting level.  The unused slot is
        a cheap dummy; leaves build both slots (negligible)."""
        if isinstance(t, AvroRecursionRef):
            if self.depth.get(t.fqn, 0) >= self.max_depth:
                # truncated: decodes to null; data beyond the bound is an error
                err = (
                    self._err(raw.isNotNull() & (raw != F.lit("null")), "UnrepresentableError", path)
                    if raw is not None
                    else _empty_errs()
                )
                return F.lit(None), err
            target = self.env.get(t.fqn)
            if target is None:
                raise InvalidParserStateError(f"dangling recursion ref {t.fqn!r}")
            return self.build(target, wire, raw, path, role)
        if isinstance(t, AvroPrimitive):
            value, err = self._prim(t.kind, wire, raw, path)
            if t.logical is not None:
                value, lerr = self._lift_logical(t.logical, value, path)
                err = self._cat(err, lerr)
            return value, err
        if isinstance(t, AvroEnum):
            ok_null = wire.isNull()
            err = self._err(~ok_null & ~wire.isin(*t.symbols), "EnumError", path)
            return wire, err
        if isinstance(t, AvroFixed):
            value = F.unbase64(wire)
            bad_b64 = wire.isNotNull() & ~wire.rlike(_B64_RE)
            bad_len = wire.isNotNull() & (F.length(value) != F.lit(t.length))
            err = self._cat(
                self._err(bad_b64, "UnexpectedTypeError", path),
                self._err(~bad_b64 & bad_len, "FixedError", path),
            )
            if t.logical is not None:  # decimal-annotated fixed
                value, lerr = self._lift_logical(t.logical, value, path)
                err = self._cat(err, lerr)
            return value, err
        if isinstance(t, AvroArray):
            return self._array(t, wire, raw, path, role)
        if isinstance(t, AvroMap):
            return self._map(t, wire, raw, path, role)
        if isinstance(t, AvroUnion):
            return self._union(t, wire, raw, path, role)
        if isinstance(t, AvroRecord):
            return self._record(t, wire, raw, path, role)
        raise InvalidParserStateError(f"unexpected type {t!r}")

    def _lift_logical(self, logical, carrier: Column, path: str) -> tuple[Column, Column]:
        """Carrier column → native Catalyst value (logical-types surface,
        beyond reference — AvroData.scala:17 TODO).  Range violations
        (time-of-day out of a day, decimal beyond the expression fold's
        15-byte bound or the declared precision) flow to the error channel
        as ``UnrepresentableError`` — the converted value is NULL there."""
        from .logical import (
            carrier_to_value_expr,
            decimal_overflow_expr,
            time_range_err_expr,
        )

        errs: list[Column] = []
        if logical.name in ("time-millis", "time-micros"):
            errs.append(self._err(time_range_err_expr(logical, carrier), "UnrepresentableError", path))
        value = carrier_to_value_expr(logical, carrier)
        if logical.name == "decimal" and logical.precision <= 38:
            errs.append(self._err(decimal_overflow_expr(carrier), "UnrepresentableError", path))
            errs.append(
                self._err(
                    carrier.isNotNull()
                    & (F.length(carrier) > 0)
                    & ~decimal_overflow_expr(carrier)
                    & value.isNull(),
                    "UnrepresentableError",
                    path,
                )
            )
        return value, self._cat(*errs) if errs else _empty_errs()

    def _prim(
        self, kind: Primitive, wire: Column, raw: Optional[Column], path: str
    ) -> tuple[Column, Column]:
        # wrong JSON type nulls the wire parse silently (from_json
        # PERMISSIVE); where raw text is addressable, a present-but-unparsed
        # value reveals the mismatch.  (Note: nested raw text for an
        # explicit JSON null is NULL; at the root it is the text 'null' —
        # both excluded here, null-ness belongs to union/record logic.)
        present_text = None if raw is None else (raw.isNotNull() & (raw != F.lit("null")))
        mismatch = (
            self._err(present_text & wire.isNull(), "UnexpectedTypeError", path)
            if raw is not None and kind not in (Primitive.NULL, Primitive.STRING, Primitive.BYTES)
            else None
        )
        if kind is Primitive.NULL:
            err = (
                self._err(present_text, "UnexpectedTypeError", path)
                if raw is not None
                else _empty_errs()
            )
            return F.lit(None), err
        if kind in (Primitive.INT, Primitive.LONG):
            if raw is not None:
                # int64 overflow also nulls the wire; the raw digits reveal
                # it.  try_cast: ANSI casts throw; >38-digit literals must
                # flow to the error channel, not crash permissive mode
                rawd = raw.try_cast("decimal(38,0)")
                integral = raw.rlike(r"^-?[0-9]+$")
                overflow = integral & (
                    rawd.isNull()  # beyond decimal(38) => certainly beyond int64
                    | (rawd > F.lit(2**63 - 1).cast("decimal(38,0)"))
                    | (rawd < F.lit(-(2**63)).cast("decimal(38,0)"))
                )
                # anything else present that the typed parse nulled is a
                # wrong JSON type — including a QUOTED in-range number: the
                # raw object view strips quotes, so integral raw digits with
                # a null wire can only mean the token was a JSON string (a
                # bare in-range integer would have parsed).  Pre-r4 this
                # case slipped through as a silent null (pydecode raises
                # UnexpectedTypeError).
                type_mismatch = self._err(
                    present_text & wire.isNull() & ~overflow, "UnexpectedTypeError", path
                )
                if kind is Primitive.INT:
                    # pydecode D3: fits int64 but not int32 → UnexpectedType;
                    # beyond int64 → Unrepresentable (the digits say which)
                    too_big = wire.isNotNull() & ((wire < INT32_MIN) | (wire > INT32_MAX))
                    return wire.try_cast("int"), self._cat(
                        self._err(too_big, "UnexpectedTypeError", path),
                        self._err(overflow, "UnrepresentableError", path),
                        type_mismatch,
                    )
                return wire, self._cat(
                    self._err(overflow, "UnrepresentableError", path), type_mismatch
                )
            if kind is Primitive.INT:
                too_big = wire.isNotNull() & ((wire < INT32_MIN) | (wire > INT32_MAX))
                # try_cast: under ANSI a plain cast would THROW on overflow
                # even in permissive mode; the range check carries the error
                return wire.try_cast("int"), self._err(too_big, "UnexpectedTypeError", path)
            return wire, _empty_errs()
        if kind in (Primitive.FLOAT, Primitive.DOUBLE):
            # strict D3: JSON integer literals are not acceptable for
            # float/double (reference matches only JSON doubles, :624-633)
            int_literal = (
                self._err(
                    raw.isNotNull() & raw.rlike(r"^-?[0-9]+$"), "UnexpectedTypeError", path
                )
                if raw is not None
                else None
            )
            if kind is Primitive.FLOAT:
                inexact = wire.isNotNull() & (wire.cast("float").cast("double") != wire)
                return wire.cast("float"), self._cat(
                    self._err(inexact, "UnrepresentableError", path), int_literal, mismatch
                )
            return wire, self._cat(int_literal, mismatch)
        if kind is Primitive.BYTES:
            bad = wire.isNotNull() & ~wire.rlike(_B64_RE)
            return F.unbase64(wire), self._err(bad, "UnexpectedTypeError", path)
        # boolean / string: wire type is already the target type
        return wire, (self._cat(mismatch) if mismatch is not None else _empty_errs())

    def _array(
        self, t: AvroArray, wire: Column, raw: Optional[Column], path: str,
        role: str = "both",
    ) -> tuple[Column, Column]:
        """Raw text, when addressable, is parsed once as ``array<string>``
        (same single-pass trick as records) and zipped element-wise with the
        typed parse — extra-field / overflow / wrong-type strictness applies
        at full depth inside arrays.  Both arrays come from the same text,
        so lengths always agree when both parse."""
        elem_path = f"{path}[]"
        want_v, want_e = role != "errs", role != "value"

        if raw is None:
            value = (
                F.transform(wire, lambda w: self.build(t.items, w, None, elem_path, "value")[0])
                if want_v
                else F.lit(None)
            )
            # array_join drops null elements → one ';'-joined string per array
            errs = (
                F.when(
                    wire.isNotNull(),
                    _nullif_empty(
                        F.array_join(
                            F.transform(
                                wire,
                                lambda w: self.build(t.items, w, None, elem_path, "errs")[1],
                            ),
                            ";",
                        )),
                )
                if want_e
                else _empty_errs()
            )
            return value, errs

        raw_elems = F.from_json(raw, T.ArrayType(T.StringType()))
        value = (
            F.zip_with(
                wire, raw_elems, lambda w, r: self.build(t.items, w, r, elem_path, "value")[0]
            )
            if want_v
            else F.lit(None)
        )
        if not want_e:
            return value, _empty_errs()
        present = raw.isNotNull() & (raw != F.lit("null"))
        # scalar/object at an array position → the raw array parse nulls;
        # an element whose *typed* parse failed nulls the whole wire array
        # (from_json PERMISSIVE) while the raw parse survives — both error
        shape = self._err(present & raw_elems.isNull(), "UnexpectedTypeError", path)
        elem_fail = self._err(
            raw_elems.isNotNull() & wire.isNull(), "UnexpectedTypeError", elem_path
        )
        errs = F.when(
            wire.isNotNull(),
            _nullif_empty(
                F.array_join(
                    F.zip_with(
                        wire, raw_elems, lambda w, r: self.build(t.items, w, r, elem_path, "errs")[1]
                    ),
                    ";",
                )),
        )
        return value, self._cat(errs, shape, elem_fail)

    def _map(
        self, t: AvroMap, wire: Column, raw: Optional[Column], path: str,
        role: str = "both",
    ) -> tuple[Column, Column]:
        """Same raw-threading as ``_array``: the one-pass object view gives
        per-value raw text; key order is identical between the typed and raw
        parses because both stream the same document."""
        val_path = f"{path}.{{}}" if raw is not None else "{}"
        want_v, want_e = role != "errs", role != "value"

        if raw is None:
            value = (
                F.map_from_arrays(
                    F.map_keys(wire),
                    F.transform(
                        F.map_values(wire),
                        lambda v: self.build(t.values, v, None, val_path, "value")[0],
                    ),
                )
                if want_v
                else F.lit(None)
            )
            errs = (
                F.when(
                    wire.isNotNull(),
                    _nullif_empty(
                        F.array_join(
                            F.transform(
                                F.map_values(wire),
                                lambda v: self.build(t.values, v, None, val_path, "errs")[1],
                            ),
                            ";",
                        )),
                )
                if want_e
                else _empty_errs()
            )
            return value, errs

        rmap = self._obj_map(raw, path)
        value = (
            F.map_from_arrays(
                F.map_keys(wire),
                F.zip_with(
                    F.map_values(wire),
                    F.map_values(rmap),
                    lambda v, r: self.build(t.values, v, r, val_path, "value")[0],
                ),
            )
            if want_v
            else F.lit(None)
        )
        if not want_e:
            return value, _empty_errs()
        present = raw.isNotNull() & (raw != F.lit("null"))
        shape = self._err(present & rmap.isNull(), "UnexpectedTypeError", path)
        val_fail = self._err(rmap.isNotNull() & wire.isNull(), "UnexpectedTypeError", val_path)
        errs = F.when(
            wire.isNotNull(),
            _nullif_empty(
                F.array_join(
                    F.zip_with(
                        F.map_values(wire),
                        F.map_values(rmap),
                        lambda v, r: self.build(t.values, v, r, val_path, "errs")[1],
                    ),
                    ";",
                )),
        )
        return value, self._cat(errs, shape, val_fail)

    def _union(
        self, t: AvroUnion, wire: Column, raw: Optional[Column], path: str,
        role: str = "both",
    ) -> tuple[Column, Column]:
        non_null = t.non_null_members
        if len(non_null) == 0:
            err = (
                self._err(raw.isNotNull() & (raw != F.lit("null")), "UnionError", path)
                if raw is not None
                else _empty_errs()
            )
            return F.lit(None), err
        branch_keys = [type_name(m) for m in non_null]
        # struct field names must match to_struct_type's collision-qualified
        # union_field_names (member_0_X on short-name collisions), not the
        # bare branch name — bare names would duplicate on collisions
        field_names = union_field_names(t)
        umap_expr = self._obj_map(raw, path)
        if umap_expr is not None:
            # let-bind the object view per output column — same k^depth
            # duplication story (and the same shared-pair trap) as _record;
            # each column's lambda runs a single-role traversal, so the
            # Python-side build stays linear too
            value = (
                _logical_let(
                    umap_expr,
                    lambda m: self._union_with_map(t, wire, raw, m, path, "value")[0],
                )
                if role != "errs"
                else F.lit(None)
            )
            errs = (
                _logical_let(
                    umap_expr,
                    lambda m: self._union_with_map(t, wire, raw, m, path, "errs")[1],
                )
                if role != "value"
                else _empty_errs()
            )
            return value, errs
        return self._union_with_map(t, wire, raw, None, path, role)

    def _union_with_map(
        self,
        t: AvroUnion,
        wire: Column,
        raw: Optional[Column],
        umap: Optional[Column],
        path: str,
        role: str = "both",
    ) -> tuple[Column, Column]:
        non_null = t.non_null_members
        branch_keys = [type_name(m) for m in non_null]
        field_names = union_field_names(t)
        want_v, want_e = role != "errs", role != "value"
        members = []
        member_errs: list[Column] = []
        for m, key, fname in zip(non_null, branch_keys, field_names):
            sub_raw = umap.getItem(key) if umap is not None else None
            v, e = self.build(m, wire.getField(key), sub_raw, f"{path}.{key}", role)
            if want_v:
                members.append(v.alias(fname))
            if want_e:
                member_errs.append(e)
        checks: list[Column] = []
        if umap is not None:
            keys = F.map_keys(umap)
            is_obj = keys.isNotNull()
            checks.append(
                self._err(raw.isNotNull() & (raw != F.lit("null")) & ~is_obj, "UnionError", path)
            )
            checks.append(self._err(is_obj & (F.size(keys) != 1), "UnionError", path))
            known = F.array(*[F.lit(k) for k in branch_keys])
            checks.append(
                self._err(
                    is_obj & (F.size(keys) == 1) & (F.size(F.array_except(keys, known)) > 0),
                    "UnionResolutionError",
                    path,
                )
            )
            if not t.is_nullable:
                checks.append(self._err(raw.isNull() & wire.isNull(), "UnionError", path))
        if not want_v:
            value = F.lit(None)
        elif len(non_null) == 1:
            # target is the bare nullable value, not a member_* struct
            value = members[0]
        else:
            value = F.when(wire.isNull(), F.lit(None)).otherwise(F.struct(*members))
        if not want_e:
            return value, _empty_errs()
        return value, self._cat(
            F.when(wire.isNotNull(), self._cat(*member_errs)),
            *checks,
        )

    def _record(
        self, t: AvroRecord, wire: Column, raw: Optional[Column], path: str,
        role: str = "both",
    ) -> tuple[Column, Column]:
        n = self.depth.get(t.fqn, 0)
        self.depth[t.fqn] = n + 1
        if n >= self.RAW_RECURSION_LIMIT:
            raw = None  # keep the expression tree linear in unroll depth
        try:
            rmap_expr = self._obj_map(raw, path)
            if rmap_expr is None:
                return self._record_with_map(t, wire, raw, None, path, role)
            # let-bind the object view separately under each output column:
            # every field extraction, the key set, and the shape check
            # reference the map — unbound, each reference embeds its own
            # copy of the from_json parse, and the copies multiply per
            # nesting level (k_fields^depth: json_decode_recursive carried
            # 178 from_json copies and spent ~20 s per call in
            # analysis+codegen for THREE rows).  The value tree references
            # only child values and the errs tree only child errors, so
            # binding per column keeps each output linear in node count.
            # (Binding one shared (v, e) pair struct instead is a trap: the
            # two getField references duplicate the pair tree and compound
            # per level — measured 250 kB plans and a 37 MiB task binary.)
            # each lambda runs a single-role traversal (children skip the
            # other slot), so Python-side build work is linear per column
            value = (
                _logical_let(
                    rmap_expr,
                    lambda m: self._record_with_map(t, wire, raw, m, path, "value")[0],
                )
                if role != "errs"
                else F.lit(None)
            )
            errs = (
                _logical_let(
                    rmap_expr,
                    lambda m: self._record_with_map(t, wire, raw, m, path, "errs")[1],
                )
                if role != "value"
                else _empty_errs()
            )
            return value, errs
        finally:
            self.depth[t.fqn] = n

    def _record_with_map(
        self,
        t: AvroRecord,
        wire: Column,
        raw: Optional[Column],
        rmap: Optional[Column],
        path: str,
        role: str = "both",
    ) -> tuple[Column, Column]:
        want_v, want_e = role != "errs", role != "value"
        keys = F.map_keys(rmap) if rmap is not None else None
        shape_err = None
        if want_e and rmap is not None:
            # JSON present but not an object (scalar/array) at a record
            # position; JSON null is the parent's (union) concern
            shape_err = self._err(
                raw.isNotNull() & (raw != F.lit("null")) & rmap.isNull(),
                "UnexpectedTypeError",
                path,
            )
        target = to_struct_type(t, self.env, self.max_depth)  # for default literals

        fields: list[Column] = []
        errs: list[Column] = []
        for f in t.fields:
            fpath = f"{path}.{f.name}"
            fwire = wire.getField(f.name)
            fraw = rmap.getItem(f.name) if rmap is not None else None
            v, e = self.build(f.type, fwire, fraw, fpath, role)
            if keys is not None:
                present = F.array_contains(keys, f.name)
                if f.has_default:
                    if want_v:
                        default_lit = self._default_lit(f, target[f.name].dataType)
                        v = F.when(present, v).otherwise(default_lit)
                    if want_e:
                        e = F.when(present, e)
                elif want_e:
                    errs.append(
                        self._err(keys.isNotNull() & ~present, "RecordError", fpath)
                    )
            else:
                # raw text unaddressable (inside a collection): proxy —
                # required non-nullable field that parsed to null is an
                # error; null with a default takes the default
                if f.has_default:
                    if want_v:
                        default_lit = self._default_lit(f, target[f.name].dataType)
                        v = F.coalesce(v, default_lit) if not _is_null_default(f) else v
                elif want_e and not _field_nullable(f):
                    errs.append(self._err(wire.isNotNull() & fwire.isNull(), "RecordError", fpath))
            if want_v:
                fields.append(v.alias(f.name))
            if want_e:
                errs.append(e)

        if not want_e:
            value = F.when(wire.isNull(), F.lit(None)).otherwise(F.struct(*fields))
            return value, _empty_errs()
        if keys is not None:
            known = F.array(*[F.lit(f.name) for f in t.fields])
            errs.append(
                self._err(
                    keys.isNotNull() & (F.size(F.array_except(keys, known)) > 0),
                    "RecordError",
                    path,
                )
            )
        value = (
            F.when(wire.isNull(), F.lit(None)).otherwise(F.struct(*fields))
            if want_v
            else F.lit(None)
        )
        guarded = [
            F.when(wire.isNotNull(), e) if keys is None else e
            for e in errs
        ]
        if shape_err is not None:
            guarded.append(shape_err)
        return value, self._cat(*guarded)

    def _default_lit(self, f: AvroField, dtype: T.DataType) -> Column:
        decoded = _PyDecoder(self.env, self.max_depth).decode(f.type, f.default, f"default({f.name})")
        return _lit_value(decoded, dtype)

    # flat-record fast path ---------------------------------------------------

    @staticmethod
    def _synth_wire(t: AvroType, rawf: Column) -> Column:
        """Typed 'wire' column synthesized from raw field text, with the
        same acceptance behavior as a from_json parse of the field — what
        lets a flat record decode with ONE JSON parse instead of two."""
        if isinstance(t, (AvroEnum, AvroFixed)):
            return rawf
        assert isinstance(t, AvroPrimitive)
        if t.kind is Primitive.BOOLEAN:
            return F.when(rawf == "true", F.lit(True)).when(rawf == "false", F.lit(False))
        if t.kind in (Primitive.INT, Primitive.LONG):
            return rawf.try_cast("long")
        if t.kind in (Primitive.FLOAT, Primitive.DOUBLE):
            # try_cast accepts the words NaN/Infinity, which JSON numbers
            # cannot be — only a (quote-stripped) string could produce them
            return F.when(
                ~rawf.isin("NaN", "Infinity", "-Infinity", "+Infinity"),
                rawf.try_cast("double"),
            )
        if t.kind is Primitive.NULL:
            return F.lit(None).cast("string")
        return rawf  # STRING / BYTES travel as text

    def build_flat_record(
        self,
        t: AvroRecord,
        rmap: Column,
        raw: Column,
        path: str,
        vprobe: Optional[Column] = None,
    ) -> tuple[Column, Column]:
        """Decode a record whose fields are all primitive/enum/fixed from
        the staged ``map<string,string>`` view alone — identical semantics
        to the general path minus its second (wire-struct) JSON parse.

        ``vprobe`` (a staged ``try_parse_json`` variant of the same text)
        closes the one hole the string map cannot see: the map view strips
        JSON quotes, so a *quoted* number/boolean at a numeric/boolean
        position (``"123"`` for ``long``) is indistinguishable from a bare
        one — ``_synth_wire``'s casts accept it where ``pydecode`` (and the
        general path's typed ``from_json``) reject.  The variant preserves
        the token type: ``schema_of_variant == 'STRING'`` at such a field
        is exactly the quoted case.  When the variant parse fails on
        JSON Jackson tolerates (bare NaN), the probe is null and the check
        silently stands down — strictness never regresses below the map
        view's."""
        keys = F.map_keys(rmap)
        present_text = raw.isNotNull() & (raw != F.lit("null"))
        shape_err = self._err(present_text & rmap.isNull(), "UnexpectedTypeError", path)
        target = to_struct_type(t, self.env, self.max_depth)

        fields: list[Column] = []
        errs: list[Column] = []
        for f in t.fields:
            fpath = f"{path}.{f.name}"
            fraw = rmap.getItem(f.name)
            v, e = self.build(f.type, self._synth_wire(f.type, fraw), fraw, fpath)
            if vprobe is not None and _kind_rejects_json_strings(f.type):
                quoted = (
                    F.schema_of_variant(F.try_variant_get(vprobe, f"$.{f.name}", "variant"))
                    == F.lit("STRING")
                )
                errs.append(self._err(quoted, "UnexpectedTypeError", fpath))
                # A quoted token is ONE violation (pydecode raises exactly one
                # UnexpectedTypeError).  The quote-stripped map view cannot see
                # the quotes, so its own checks may fire too — the int-literal
                # check for "2" at a double position, the cast-null mismatch
                # for "abc" at a long position — producing a duplicate (or a
                # bogus Unrepresentable from a cast of what was a string
                # token).  The probe's verdict wins; stand-down (null probe)
                # keeps the map view's errors.
                e = F.when(~F.coalesce(quoted, F.lit(False)), e)
            present = F.array_contains(keys, f.name)
            if f.has_default:
                default_lit = self._default_lit(f, target[f.name].dataType)
                v = F.when(present, v).otherwise(default_lit)
                e = F.when(present, e)
            else:
                errs.append(self._err(keys.isNotNull() & ~present, "RecordError", fpath))
            fields.append(v.alias(f.name))
            errs.append(e)

        known = F.array(*[F.lit(f.name) for f in t.fields])
        errs.append(
            self._err(
                keys.isNotNull() & (F.size(F.array_except(keys, known)) > 0),
                "RecordError",
                path,
            )
        )
        value = F.when(rmap.isNull(), F.lit(None)).otherwise(F.struct(*fields))
        guarded = [F.when(rmap.isNotNull(), e) for e in errs]
        guarded.append(shape_err)
        return value, self._cat(*guarded)


def _is_flat_record(t: AvroType) -> bool:
    return isinstance(t, AvroRecord) and all(
        isinstance(f.type, (AvroPrimitive, AvroEnum, AvroFixed)) for f in t.fields
    )


def _kind_rejects_json_strings(t: AvroType) -> bool:
    """Primitive kinds for which a JSON string token is a type error that
    the quote-stripping map view cannot detect (numerics + boolean)."""
    return isinstance(t, AvroPrimitive) and t.kind in (
        Primitive.INT,
        Primitive.LONG,
        Primitive.FLOAT,
        Primitive.DOUBLE,
        Primitive.BOOLEAN,
    )


def _field_nullable(f: AvroField) -> bool:
    t = f.type
    if isinstance(t, AvroPrimitive) and t.kind is Primitive.NULL:
        return True
    return isinstance(t, AvroUnion) and t.is_nullable


def _is_null_default(f: AvroField) -> bool:
    return f.has_default and f.default is None


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

#: (schema JSON string, max_depth) -> (wire_t, flat, needs_vprobe, value,
#: errs) — see the cache note inside decode_json.  Bounded like the codec
#: compile caches; Columns are immutable expression trees, safe to embed in
#: any number of plans.
_DECODE_EXPR_CACHE: dict[tuple, tuple] = {}
_DECODE_EXPR_CACHE_MAX = 256


def decode_json(
    df: DataFrame,
    col: str | Column,
    schema: ParsedSchema | AvroType | str,
    mode: str = "strict",
    max_depth: int = 10,
    output_col: str = "decoded",
    errors_col: str = "_errors",
) -> DataFrame:
    """Decode a JSON-text column against an Avro schema, strictly.

    Engine analogue of reference ``parseDatum`` (AvroJsonFAlgebras.scala:715-723)
    lifted to a whole column.  ``mode``:

    * ``"strict"``   — any violation raises (executor-side, via assert_true);
    * ``"permissive"`` — adds ``errors_col: array<string>`` of ``Code@path``.
    """
    # schema-keyed EXPRESSION cache (r14-opt, the pydecode/avro_binary
    # compile-cache pattern lifted to the Column layer): the (wire type,
    # value, errs) trees are pure functions of (schema JSON, max_depth) —
    # they reference only the FIXED internal stage-column names below —
    # and building them cost ~0.5 s of py4j round trips per invocation on
    # the flat events schema.  Keyed on the schema STRING (all engine
    # callers pass the JSON literal); ParsedSchema/AvroType callers skip
    # the cache.  Compile cache, never data: the per-row parse still runs
    # at every action.
    cache_key = (schema, max_depth) if isinstance(schema, str) else None
    cached = _DECODE_EXPR_CACHE.get(cache_key) if cache_key is not None else None
    raw = F.col(col) if isinstance(col, str) else col

    # staged projections: the wire parse and the error string are
    # materialized as intermediate columns THROUGH A GENERATE BARRIER
    # (below) so each is evaluated exactly once.  A plain withColumn is
    # not enough: CollapseProject inlines the from_json into every
    # downstream reference, and JsonToStructs is CodegenFallback — no
    # codegen subexpression elimination reaches it, so the validation
    # tree's many references each re-parsed the JSON (measured 246
    # from_json copies in q_stream_decode's physical plan, ~13x the
    # pipeline's runtime, before the barrier).
    wire_col = "_anglerfish_wire"
    rmap_col = "_anglerfish_rmap"
    err_col = "_anglerfish_errs"
    raw_col = "_anglerfish_raw"
    vprobe_col = "_anglerfish_vprobe"
    if cached is not None:
        wire_t, flat, needs_vprobe, value, errs = cached
    else:
        if isinstance(schema, str):
            schema = parse_schema(schema)
        if isinstance(schema, ParsedSchema):
            root, env = schema.root, schema.env
        else:
            root, env = schema, {}
        wire_t = wire_struct_type(root, env, max_depth)
        if not isinstance(wire_t, (T.StructType, T.ArrayType, T.MapType)):
            raise InvalidParserStateError(
                "root schema must be a record, array, map, or multi-union"
            )
        flat = _is_flat_record(root)
        needs_vprobe = flat and any(
            _kind_rejects_json_strings(f.type) for f in root.fields
        )
        builder = _ExprBuilder(env, max_depth, root_map=F.col(rmap_col))
        if flat:
            # flat records decode from the map view alone: ONE JSON parse/row
            value, errs = builder.build_flat_record(
                root,
                F.col(rmap_col),
                F.col(raw_col),
                "$",
                vprobe=F.col(vprobe_col) if needs_vprobe else None,
            )
        else:
            value, errs = builder.build(root, F.col(wire_col), F.col(raw_col), "$")
        if cache_key is not None:
            if len(_DECODE_EXPR_CACHE) >= _DECODE_EXPR_CACHE_MAX:
                _DECODE_EXPR_CACHE.clear()
            _DECODE_EXPR_CACHE[cache_key] = (wire_t, flat, needs_vprobe, value, errs)
    staged = df.withColumn(raw_col, raw).withColumn(
        rmap_col, F.from_json(F.col(raw_col), T.MapType(T.StringType(), T.StringType()))
    )
    if not flat:
        staged = staged.withColumn(wire_col, F.from_json(F.col(raw_col), wire_t))
    if needs_vprobe:
        # quoted-number/boolean detection (see build_flat_record): one
        # variant parse per row, staged through the same barrier — but only
        # for rows that can possibly contain a quoted token.  By JSON
        # grammar a string value is always ':' + optional whitespace + '"',
        # so rows without that byte pattern provably hold no quoted token
        # and skip the second (variant) parse entirely; the per-field
        # checks see a null probe there and stand down, which is exact.
        # Measured (r5 A/B, same session, sf0.1 events): the whole probe
        # apparatus costs ~6% on json_decode_strict (0.68 -> 0.72 s) and
        # the prefilter is neutral-to-slightly-positive on these ~15-byte
        # payloads — its real payoff is numeric-only payloads at realistic
        # row sizes, where it skips a full second parse of the row text.
        staged = staged.withColumn(
            vprobe_col,
            F.when(F.col(raw_col).rlike(':\\s*"'), F.try_parse_json(F.col(raw_col))),
        )
    # Generate barrier: explode of a one-element array is a row-preserving
    # generator Catalyst cannot collapse a Project through, so the parsed
    # columns materialize once and every downstream reference reads the
    # materialized value.  Stays whole-stage-codegen (Generate is
    # codegen-able; the single CodegenFallback parse runs once per row).
    staged = staged.select(
        F.explode(F.array(F.struct(*[F.col(c) for c in staged.columns]))).alias("_b")
    ).select("_b.*")
    raw = F.col(raw_col)
    # malformed JSON text: get_json_object('$') is null only when the text
    # does not parse at all (from_json PERMISSIVE yields an all-null struct,
    # so the parsed column cannot be used to detect this).  The rmap guard
    # in front short-circuits in codegen (Java &&), so this third parse
    # only runs for rows whose map parse already failed — rare, unless the
    # root schema is an array (rmap is then always null).
    malformed = raw.isNotNull() & F.col(rmap_col).isNull() & F.get_json_object(raw, "$").isNull()
    errs = F.when(malformed, F.lit("UnexpectedJsonTypeError@$")).otherwise(errs)
    staged = staged.withColumn(err_col, errs).withColumn(output_col, value)
    if not flat:
        # second Generate barrier: CollapseProject would otherwise inline
        # the (deep) errs tree into the strict/permissive output column and
        # SimplifyConditionals then grinds the merged tree — measured 2.8 s
        # of the 3 s optimizer time on the depth-5 recursive decode
        # (CollapseProject 1.44 s + SimplifyConditionals 1.36 s via
        # RuleExecutor.dumpTimeSpent; SCALE.md #23).  Behind a barrier both
        # trees stay in their own Project and are optimized once each.
        # Flat records skip it: their trees are small and the extra
        # Generate would tax the hot json_decode_strict path.
        staged = staged.select(
            F.explode(F.array(F.struct(*[F.col(c) for c in staged.columns]))).alias("_b2")
        ).select("_b2.*")
    e = F.col(err_col)
    stage_cols = [
        c for c in (wire_col, rmap_col, err_col, raw_col, vprobe_col) if c in staged.columns
    ]

    if mode == "permissive":
        err_arr = F.when(e.isNull(), F.array().cast("array<string>")).otherwise(F.split(e, ";"))
        return staged.withColumn(errors_col, err_arr).drop(*stage_cols)
    if mode == "strict":
        boom = F.raise_error(F.concat(F.lit("anglerfish strict decode failed: "), e))
        return (
            staged.withColumn(
                output_col, F.when(e.isNotNull(), boom).otherwise(F.col(output_col))
            )
            .drop(*stage_cols)
        )
    raise ValueError(f"unknown mode {mode!r} (strict|permissive)")


def decode_json_python(
    df: DataFrame,
    col: str,
    schema: ParsedSchema | AvroType | str,
    mode: str = "strict",
    max_depth: int = 10,
    output_col: str = "decoded",
    errors_col: str = "_errors",
) -> DataFrame:
    """Full-fidelity decode via the pure-Python reference decoder, run as
    an Arrow-batched ``mapInPandas`` stage (the engine's codec extension
    point).  Semantics are exactly ``pydecode`` — including the quoted-
    number distinctions the expression path cannot see — at pandas-UDF
    cost; use :func:`decode_json` (expressions, whole-stage codegen) on
    hot paths.
    """
    import json as _json

    from ..errors import DatumError

    if isinstance(schema, str):
        schema = parse_schema(schema)
    if isinstance(schema, ParsedSchema):
        root, env = schema.root, schema.env
    else:
        root, env = schema, {}
    if mode not in ("strict", "permissive"):
        raise ValueError(f"unknown mode {mode!r} (strict|permissive)")

    target = to_struct_type(root, env, max_depth)
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(output_col, target, True),
            T.StructField(errors_col, T.ArrayType(T.StringType()), True),
        ]
    )
    strict = mode == "strict"

    def _bad_const(_):
        raise ValueError("non-finite JSON number")

    def run(batches):
        import pandas as pd

        from .pydecode import compile_decoder

        # schema-compiled once per task (r14-opt, guide §4.2) — exception
        # type+message identical to the _PyDecoder reference twin by the
        # differential suite, so the permissive error column is unchanged
        dec_fn = compile_decoder(root, env, max_depth)
        for pdf in batches:
            decoded, errs = [], []
            for txt in pdf[col]:
                if txt is None:
                    decoded.append(None)
                    errs.append([])
                    continue
                try:
                    datum = _json.loads(txt, parse_constant=_bad_const)
                except ValueError:
                    if strict:
                        raise
                    decoded.append(None)
                    errs.append(["UnexpectedJsonTypeError@$"])
                    continue
                try:
                    decoded.append(dec_fn(datum))
                    errs.append([])
                except DatumError as ex:
                    if strict:
                        raise
                    decoded.append(None)
                    errs.append([f"{type(ex).__name__}@{str(ex).split(':')[0]}"])
            out = pdf.copy()
            out[output_col] = pd.Series(decoded, index=pdf.index, dtype="object")
            out[errors_col] = pd.Series(errs, index=pdf.index, dtype="object")
            yield out

    return df.mapInPandas(run, out_schema)
