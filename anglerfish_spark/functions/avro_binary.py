"""Pure-Python Avro *binary* codec over the engine's schema tree, exposed
as Arrow-batched pandas UDFs.

Engine analogue of the reference's value-interop folds I4/I5
(avroGenericReprToInternal / avroValueToGenericRepr,
/root/reference/src/main/scala/ch/grafblutwurst/anglerfish/data/avro/
AvroGenericInteropFAlgebras.scala:157-289,383-411): where the reference
converts between its value tree and ``org.apache.avro`` runtime objects,
the engine converts between decoded values and the Avro 1.x *binary wire
format* (spec: zigzag-varint ints/longs, little-endian IEEE floats,
length-prefixed bytes/strings, block-encoded arrays/maps, branch-index
prefixed unions) — implemented from the public Avro specification.

The spark-avro connector is not on this classpath (pip pyspark ships
avro-core only), so the UDF route is the supported path; on a cluster with
spark-avro, ``sources.registry.avro_available`` gates the native
``from_avro``/``to_avro`` instead.  The UDFs are Series→Series pandas UDFs
(Arrow batches, not row-at-a-time Python).
"""

from __future__ import annotations

import base64 as _b64mod
import datetime as _dt
import io
import json
import struct as _struct
from functools import lru_cache
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codec.logical import py_carrier_to_value, py_value_to_carrier
from ..errors import DatumError, UnionResolutionError
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
from ..schema.spark_convert import union_field_names

# ---------------------------------------------------------------------------
# primitive wire encoding (Avro spec §binary encoding)
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(out: io.BytesIO, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _append_long(ba: bytearray, n: int) -> None:
    """``write_long`` against a bytearray (the compiled encoder's sink);
    byte-identical output to :func:`write_long`."""
    z = ((n << 1) ^ (n >> 63)) & 0xFFFFFFFFFFFFFFFF
    while z > 0x7F:
        ba.append((z & 0x7F) | 0x80)
        z >>= 7
    ba.append(z)


def read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        if shift > 63:  # valid zigzag varints are at most 10 bytes
            raise DatumError(f"varint longer than 10 bytes at offset {pos}")
        try:
            b = buf[pos]
        except IndexError:
            raise DatumError(f"truncated varint at offset {pos}") from None
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc), pos
        shift += 7


def _take(buf: bytes, pos: int, n: int) -> bytes:
    if n < 0 or pos + n > len(buf):
        raise DatumError(f"length {n} at offset {pos} overruns buffer of {len(buf)}")
    return buf[pos : pos + n]


# ---------------------------------------------------------------------------
# schema-directed encode/decode of the engine's decoded representation
# ---------------------------------------------------------------------------


class BinaryCodec:
    """Encode/decode decoded-representation values (dicts/lists/scalars as
    produced by ``codec.pydecode``) to/from Avro binary."""

    def __init__(self, schema: ParsedSchema | AvroType | str):
        if isinstance(schema, str):
            schema = parse_schema(schema)
        if isinstance(schema, ParsedSchema):
            self.root, self.env = schema.root, schema.env
        else:
            self.root, self.env = schema, {}
        # schema-compiled fast paths (r13 optimization: resolve the AST
        # walk ONCE per codec into nested closures instead of re-running
        # the isinstance dispatch per value — guide §4.2).  Built lazily
        # on first encode()/decode(); the interpreted `_enc`/`_dec` walks
        # below stay as the readable reference the compiled closures are
        # differential-tested against (tests/test_avro_binary.py).
        self._enc_fn = None
        self._dec_fn = None
        self._enc_named: dict[str, Any] = {}
        self._dec_named: dict[str, Any] = {}

    # -- encode --------------------------------------------------------------

    def encode(self, value: Any) -> bytes:
        fn = self._enc_fn
        if fn is None:
            fn = self._enc_fn = self._compile_enc(self.root)
        ba = bytearray()
        fn(value, ba)
        return bytes(ba)

    def encode_interpreted(self, value: Any) -> bytes:
        """The uncompiled walk — reference implementation for tests."""
        out = io.BytesIO()
        self._enc(self.root, value, out)
        return out.getvalue()

    def _enc(self, t: AvroType, v: Any, out: io.BytesIO) -> None:
        if isinstance(t, AvroRecursionRef):
            self._enc(self.env[t.fqn], v, out)
        elif isinstance(t, AvroPrimitive):
            if t.logical is not None:
                # semantic values (datetime/date/time/Decimal) down-convert
                # to the carrier; carrier-typed inputs pass through unchanged
                v = py_value_to_carrier(t.logical, v)
            k = t.kind
            if k is Primitive.NULL:
                pass
            elif k is Primitive.BOOLEAN:
                out.write(b"\x01" if v else b"\x00")
            elif k in (Primitive.INT, Primitive.LONG):
                write_long(out, int(v))
            elif k is Primitive.FLOAT:
                out.write(_struct.pack("<f", float(v)))
            elif k is Primitive.DOUBLE:
                out.write(_struct.pack("<d", float(v)))
            elif k in (Primitive.BYTES,):
                write_long(out, len(v))
                out.write(bytes(v))
            elif k is Primitive.STRING:
                raw = v.encode("utf-8")
                write_long(out, len(raw))
                out.write(raw)
        elif isinstance(t, AvroEnum):
            write_long(out, t.symbols.index(v))
        elif isinstance(t, AvroFixed):
            if t.logical is not None:
                v = py_value_to_carrier(t.logical, v, fixed_length=t.length)
            out.write(bytes(v))
        elif isinstance(t, AvroArray):
            if v:
                write_long(out, len(v))
                for item in v:
                    self._enc(t.items, item, out)
            write_long(out, 0)
        elif isinstance(t, AvroMap):
            if v:
                write_long(out, len(v))
                for mk, mv in v.items():
                    raw = mk.encode("utf-8")
                    write_long(out, len(raw))
                    out.write(raw)
                    self._enc(t.values, mv, out)
            write_long(out, 0)
        elif isinstance(t, AvroUnion):
            idx, member, inner = self._pick_branch(t, v)
            write_long(out, idx)
            if member is not None:
                self._enc(member, inner, out)
        elif isinstance(t, AvroRecord):
            for f in t.fields:
                self._enc(f.type, v[f.name], out)
        else:
            raise DatumError(f"cannot encode against {t!r}")

    def _pick_branch(self, t: AvroUnion, v: Any):
        """Map the decoded union representation back to a branch index."""
        members = list(t.members)
        if v is None:
            for i, m in enumerate(members):
                if isinstance(m, AvroPrimitive) and m.kind is Primitive.NULL:
                    return i, None, None
            raise UnionResolutionError("null value but union has no null member")
        non_null = t.non_null_members
        if len(non_null) == 1:
            m = non_null[0]
            return members.index(m), m, v
        if not isinstance(v, dict):
            raise UnionResolutionError(f"multi-union value must be a member dict, got {v!r}")
        for name, m in zip(union_field_names(t), non_null):
            if v.get(name) is not None:
                return members.index(m), m, v[name]
        raise UnionResolutionError(f"no non-null member in {sorted(v)}")

    # -- decode --------------------------------------------------------------

    def decode(self, data: bytes) -> Any:
        fn = self._dec_fn
        if fn is None:
            fn = self._dec_fn = self._compile_dec(self.root)
        v, pos = fn(data, 0)
        if pos != len(data):
            raise DatumError(f"trailing bytes after decode: {len(data) - pos}")
        return v

    def decode_interpreted(self, data: bytes) -> Any:
        """The uncompiled walk — reference implementation for tests."""
        v, pos = self._dec(self.root, data, 0)
        if pos != len(data):
            raise DatumError(f"trailing bytes after decode: {len(data) - pos}")
        return v

    def decode_fn(self):
        """The compiled ``(buf, pos) -> (value, pos)`` root decoder — for
        callers that stream multiple datums out of one buffer (OCF blocks)
        and manage positions themselves."""
        fn = self._dec_fn
        if fn is None:
            fn = self._dec_fn = self._compile_dec(self.root)
        return fn

    def _dec(self, t: AvroType, buf: bytes, pos: int) -> tuple[Any, int]:
        if isinstance(t, AvroRecursionRef):
            return self._dec(self.env[t.fqn], buf, pos)
        if isinstance(t, AvroPrimitive):
            k = t.kind
            if k is Primitive.NULL:
                return None, pos
            if k is Primitive.BOOLEAN:
                return buf[pos] == 1, pos + 1
            if k in (Primitive.INT, Primitive.LONG):
                return read_long(buf, pos)
            if k is Primitive.FLOAT:
                return _struct.unpack_from("<f", buf, pos)[0], pos + 4
            if k is Primitive.DOUBLE:
                return _struct.unpack_from("<d", buf, pos)[0], pos + 8
            if k is Primitive.BYTES:
                n, pos = read_long(buf, pos)
                return _take(buf, pos, n), pos + n
            if k is Primitive.STRING:
                n, pos = read_long(buf, pos)
                return _take(buf, pos, n).decode("utf-8"), pos + n
        if isinstance(t, AvroEnum):
            i, pos = read_long(buf, pos)
            if not 0 <= i < len(t.symbols):
                raise DatumError(f"enum index {i} out of range for {t.name}")
            return t.symbols[i], pos
        if isinstance(t, AvroFixed):
            return _take(buf, pos, t.length), pos + t.length
        if isinstance(t, AvroArray):
            out = []
            while True:
                n, pos = read_long(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:  # block with byte-size prefix
                    _, pos = read_long(buf, pos)
                    n = -n
                for _ in range(n):
                    v, pos = self._dec(t.items, buf, pos)
                    out.append(v)
        if isinstance(t, AvroMap):
            out = {}
            while True:
                n, pos = read_long(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    _, pos = read_long(buf, pos)
                    n = -n
                for _ in range(n):
                    klen, pos = read_long(buf, pos)
                    key = _take(buf, pos, klen).decode("utf-8")
                    pos += klen
                    out[key], pos = self._dec(t.values, buf, pos)
        if isinstance(t, AvroUnion):
            idx, pos = read_long(buf, pos)
            if not 0 <= idx < len(t.members):
                raise DatumError(f"union branch index {idx} out of range")
            member = t.members[idx]
            if isinstance(member, AvroPrimitive) and member.kind is Primitive.NULL:
                return None, pos
            v, pos = self._dec(member, buf, pos)
            if len(t.non_null_members) == 1:
                return v, pos
            nn = t.non_null_members
            names = union_field_names(t)
            out = dict.fromkeys(names)
            out[names[nn.index(member)]] = v
            return out, pos
        if isinstance(t, AvroRecord):
            rec = {}
            for f in t.fields:
                rec[f.name], pos = self._dec(f.type, buf, pos)
            return rec, pos
        raise DatumError(f"cannot decode against {t!r}")

    # -- schema compilers ------------------------------------------------------
    # Each mirrors its interpreted twin branch-for-branch (same outputs,
    # same exception types AND messages — the permissive UDFs surface the
    # message text as query output, so it is oracle-pinned).  Recursive
    # named types compile once into `_dec_named`/`_enc_named` behind a
    # one-cell trampoline so self-reference terminates.

    def _compile_dec(self, t: AvroType):
        if isinstance(t, AvroRecursionRef):
            named = self._dec_named
            fn = named.get(t.fqn)
            if fn is None:
                cell = []
                named[t.fqn] = lambda buf, pos: cell[0](buf, pos)
                real = self._compile_dec(self.env[t.fqn])
                cell.append(real)
                named[t.fqn] = real
                return real
            return fn
        if isinstance(t, AvroPrimitive):
            k = t.kind
            if k is Primitive.NULL:
                return lambda buf, pos: (None, pos)
            if k is Primitive.BOOLEAN:
                return lambda buf, pos: (buf[pos] == 1, pos + 1)
            if k in (Primitive.INT, Primitive.LONG):
                return read_long
            if k is Primitive.FLOAT:
                unpack = _struct.unpack_from
                return lambda buf, pos: (unpack("<f", buf, pos)[0], pos + 4)
            if k is Primitive.DOUBLE:
                unpack = _struct.unpack_from
                return lambda buf, pos: (unpack("<d", buf, pos)[0], pos + 8)
            if k is Primitive.BYTES:

                def dec_bytes(buf, pos):
                    n, pos = read_long(buf, pos)
                    return _take(buf, pos, n), pos + n

                return dec_bytes
            if k is Primitive.STRING:

                def dec_string(buf, pos):
                    n, pos = read_long(buf, pos)
                    return _take(buf, pos, n).decode("utf-8"), pos + n

                return dec_string
        if isinstance(t, AvroEnum):
            symbols = t.symbols
            n_sym = len(symbols)
            tname = t.name

            def dec_enum(buf, pos):
                i, pos = read_long(buf, pos)
                if not 0 <= i < n_sym:
                    raise DatumError(f"enum index {i} out of range for {tname}")
                return symbols[i], pos

            return dec_enum
        if isinstance(t, AvroFixed):
            length = t.length
            return lambda buf, pos: (_take(buf, pos, length), pos + length)
        if isinstance(t, AvroArray):
            dec_item = self._compile_dec(t.items)

            def dec_array(buf, pos):
                out = []
                append = out.append
                while True:
                    n, pos = read_long(buf, pos)
                    if n == 0:
                        return out, pos
                    if n < 0:  # block with byte-size prefix
                        _, pos = read_long(buf, pos)
                        n = -n
                    for _ in range(n):
                        v, pos = dec_item(buf, pos)
                        append(v)

            return dec_array
        if isinstance(t, AvroMap):
            dec_val = self._compile_dec(t.values)

            def dec_map(buf, pos):
                out = {}
                while True:
                    n, pos = read_long(buf, pos)
                    if n == 0:
                        return out, pos
                    if n < 0:
                        _, pos = read_long(buf, pos)
                        n = -n
                    for _ in range(n):
                        klen, pos = read_long(buf, pos)
                        key = _take(buf, pos, klen).decode("utf-8")
                        pos += klen
                        out[key], pos = dec_val(buf, pos)

            return dec_map
        if isinstance(t, AvroUnion):
            members = t.members
            n_mem = len(members)
            member_fns = [self._compile_dec(m) for m in members]
            is_null = [
                isinstance(m, AvroPrimitive) and m.kind is Primitive.NULL
                for m in members
            ]
            nn = t.non_null_members
            single = len(nn) == 1
            names = None if single else union_field_names(t)
            # decoded-repr key per member index, computed exactly as the
            # interpreted walk does (names[nn.index(member)])
            key_of = (
                None
                if single
                else {
                    i: names[nn.index(m)]
                    for i, m in enumerate(members)
                    if not is_null[i]
                }
            )

            def dec_union(buf, pos):
                idx, pos = read_long(buf, pos)
                if not 0 <= idx < n_mem:
                    raise DatumError(f"union branch index {idx} out of range")
                if is_null[idx]:
                    return None, pos
                v, pos = member_fns[idx](buf, pos)
                if single:
                    return v, pos
                out = dict.fromkeys(names)
                out[key_of[idx]] = v
                return out, pos

            return dec_union
        if isinstance(t, AvroRecord):
            field_fns = [(f.name, self._compile_dec(f.type)) for f in t.fields]

            def dec_record(buf, pos):
                rec = {}
                for name, fn in field_fns:
                    rec[name], pos = fn(buf, pos)
                return rec, pos

            return dec_record

        def dec_unknown(buf, pos):
            raise DatumError(f"cannot decode against {t!r}")

        return dec_unknown

    def _compile_enc(self, t: AvroType):
        if isinstance(t, AvroRecursionRef):
            named = self._enc_named
            fn = named.get(t.fqn)
            if fn is None:
                cell = []
                named[t.fqn] = lambda v, ba: cell[0](v, ba)
                real = self._compile_enc(self.env[t.fqn])
                cell.append(real)
                named[t.fqn] = real
                return real
            return fn
        if isinstance(t, AvroPrimitive):
            k = t.kind
            logical = t.logical
            if k is Primitive.NULL:
                if logical is not None:
                    return lambda v, ba: py_value_to_carrier(logical, v) and None
                return lambda v, ba: None
            if k is Primitive.BOOLEAN:
                base = lambda v, ba: ba.append(1 if v else 0)  # noqa: E731
            elif k in (Primitive.INT, Primitive.LONG):
                base = lambda v, ba: _append_long(ba, int(v))  # noqa: E731
            elif k is Primitive.FLOAT:
                pack = _struct.pack

                def base(v, ba):
                    ba += pack("<f", float(v))

            elif k is Primitive.DOUBLE:
                pack = _struct.pack

                def base(v, ba):
                    ba += pack("<d", float(v))

            elif k is Primitive.BYTES:

                def base(v, ba):
                    _append_long(ba, len(v))
                    ba += bytes(v)

            elif k is Primitive.STRING:

                def base(v, ba):
                    raw = v.encode("utf-8")
                    _append_long(ba, len(raw))
                    ba += raw

            if logical is None:
                return base

            def enc_logical(v, ba):
                base(py_value_to_carrier(logical, v), ba)

            return enc_logical
        if isinstance(t, AvroEnum):
            symbols = t.symbols
            return lambda v, ba: _append_long(ba, symbols.index(v))
        if isinstance(t, AvroFixed):
            logical = t.logical
            length = t.length
            if logical is None:

                def enc_fixed(v, ba):
                    ba += bytes(v)

                return enc_fixed

            def enc_fixed_logical(v, ba):
                ba += bytes(py_value_to_carrier(logical, v, fixed_length=length))

            return enc_fixed_logical
        if isinstance(t, AvroArray):
            enc_item = self._compile_enc(t.items)

            def enc_array(v, ba):
                if v:
                    _append_long(ba, len(v))
                    for item in v:
                        enc_item(item, ba)
                _append_long(ba, 0)

            return enc_array
        if isinstance(t, AvroMap):
            enc_val = self._compile_enc(t.values)

            def enc_map(v, ba):
                if v:
                    _append_long(ba, len(v))
                    for mk, mv in v.items():
                        raw = mk.encode("utf-8")
                        _append_long(ba, len(raw))
                        ba += raw
                        enc_val(mv, ba)
                _append_long(ba, 0)

            return enc_map
        if isinstance(t, AvroUnion):
            members = list(t.members)
            null_idx = next(
                (
                    i
                    for i, m in enumerate(members)
                    if isinstance(m, AvroPrimitive) and m.kind is Primitive.NULL
                ),
                None,
            )
            nn = t.non_null_members
            if len(nn) == 1:
                m = nn[0]
                m_idx = members.index(m)
                enc_m = self._compile_enc(m)

                def enc_union_single(v, ba):
                    if v is None:
                        if null_idx is None:
                            raise UnionResolutionError(
                                "null value but union has no null member"
                            )
                        _append_long(ba, null_idx)
                        return
                    _append_long(ba, m_idx)
                    enc_m(v, ba)

                return enc_union_single
            branches = [
                (name, members.index(m), self._compile_enc(m))
                for name, m in zip(union_field_names(t), nn)
            ]

            def enc_union_multi(v, ba):
                if v is None:
                    if null_idx is None:
                        raise UnionResolutionError(
                            "null value but union has no null member"
                        )
                    _append_long(ba, null_idx)
                    return
                if not isinstance(v, dict):
                    raise UnionResolutionError(
                        f"multi-union value must be a member dict, got {v!r}"
                    )
                for name, idx, fn in branches:
                    if v.get(name) is not None:
                        _append_long(ba, idx)
                        fn(v[name], ba)
                        return
                raise UnionResolutionError(f"no non-null member in {sorted(v)}")

            return enc_union_multi
        if isinstance(t, AvroRecord):
            field_fns = [(f.name, self._compile_enc(f.type)) for f in t.fields]

            def enc_record(v, ba):
                for name, fn in field_fns:
                    fn(v[name], ba)

            return enc_record

        def enc_unknown(v, ba):
            raise DatumError(f"cannot encode against {t!r}")

        return enc_unknown


def dumps_avro_json(v: Any) -> str:
    """``json.dumps`` of a decoded representation.  bytes/fixed values decode
    to Python ``bytes``, which json can't serialize — render them as base64
    text, mirroring pydecode's Avro-JSON input representation (D4,
    AvroJsonFAlgebras.scala:56) so decode→dumps→encode round-trips.

    NB this dumps the *decoded representation* (nullable unions bare,
    multi-unions as ``member_*`` dicts) — NOT spec Avro-JSON.  To produce
    text the strict JSON decoder accepts (tagged unions), use
    :func:`as_avro_json` with the schema."""
    return json.dumps(v, sort_keys=False, default=_bytes_to_b64)


def as_avro_json(t, v: Any, env: dict | None = None):
    """Decoded-representation value → JSON-dumpable *Avro-JSON* structure
    (the strict decoder's input grammar): unions tagged by branch key
    (primitives by type name, named types by FQN — S3,
    AvroJsonFAlgebras.scala:536-565), bytes/fixed as base64 text (engine
    convention, D4), logical-typed semantic values down-converted to their
    carriers.  The exact inverse of ``pydecode.Decoder.decode``."""
    env = env or {}
    if isinstance(t, AvroRecursionRef):
        return as_avro_json(env[t.fqn], v, env)
    if isinstance(t, AvroPrimitive):
        if t.logical is not None:
            v = py_value_to_carrier(t.logical, v)
        if t.kind is Primitive.BYTES and v is not None:
            return _b64mod.b64encode(bytes(v)).decode("ascii")
        return v
    if isinstance(t, AvroFixed):
        if t.logical is not None:
            v = py_value_to_carrier(t.logical, v, fixed_length=t.length)
        return None if v is None else _b64mod.b64encode(bytes(v)).decode("ascii")
    if isinstance(t, AvroEnum):
        return v
    if isinstance(t, AvroArray):
        return [as_avro_json(t.items, x, env) for x in v]
    if isinstance(t, AvroMap):
        return {k: as_avro_json(t.values, x, env) for k, x in v.items()}
    if isinstance(t, AvroUnion):
        if v is None:
            return None
        nn = t.non_null_members
        if len(nn) == 1:
            m = nn[0]
            return {_branch_json_key(m): as_avro_json(m, v, env)}
        # decoded repr: dict keyed by union_field_names — the SAME
        # collision-qualified names _carrierize/to_struct_type emit
        # (member_0_X when short names collide), not the bare branch name.
        for key, m in zip(union_field_names(t), nn):
            inner = v.get(key)
            if inner is not None:
                return {_branch_json_key(m): as_avro_json(m, inner, env)}
        raise DatumError(
            f"non-null union value {v!r} matches no branch of {[_branch_json_key(m) for m in nn]}"
        )
    if isinstance(t, AvroRecord):
        return {f.name: as_avro_json(f.type, v.get(f.name), env) for f in t.fields}
    raise DatumError(f"cannot serialize against {t!r}")


def _branch_json_key(m) -> str:
    """Avro-JSON union branch key (S3): named types by FQN, array/map by
    their literal kind, primitives by type name."""
    return type_name(m)


def _compile_json_view(root: AvroType, env: dict):
    """Schema-compiled :func:`as_avro_json`: one closure per schema node,
    built once, mirroring the interpreted walk branch-for-branch (same
    values, same exception types and messages).  r13 optimization — the
    decode UDFs call this walk once per row, so the per-call dispatch is
    a corpus-scale constant (guide §4.2)."""
    named: dict[str, Any] = {}

    def comp(t: AvroType):
        if isinstance(t, AvroRecursionRef):
            fn = named.get(t.fqn)
            if fn is None:
                cell = []
                named[t.fqn] = lambda v: cell[0](v)
                real = comp(env[t.fqn])
                cell.append(real)
                named[t.fqn] = real
                return real
            return fn
        if isinstance(t, AvroPrimitive):
            logical = t.logical
            if t.kind is Primitive.BYTES:
                if logical is None:
                    return lambda v: (
                        None if v is None else _b64mod.b64encode(bytes(v)).decode("ascii")
                    )

                def jv_bytes_logical(v):
                    v = py_value_to_carrier(logical, v)
                    return None if v is None else _b64mod.b64encode(bytes(v)).decode("ascii")

                return jv_bytes_logical
            if logical is None:
                return lambda v: v
            return lambda v: py_value_to_carrier(logical, v)
        if isinstance(t, AvroFixed):
            logical = t.logical
            if logical is None:
                return lambda v: (
                    None if v is None else _b64mod.b64encode(bytes(v)).decode("ascii")
                )
            length = t.length

            def jv_fixed_logical(v):
                v = py_value_to_carrier(logical, v, fixed_length=length)
                return None if v is None else _b64mod.b64encode(bytes(v)).decode("ascii")

            return jv_fixed_logical
        if isinstance(t, AvroEnum):
            return lambda v: v
        if isinstance(t, AvroArray):
            item_fn = comp(t.items)
            return lambda v: [item_fn(x) for x in v]
        if isinstance(t, AvroMap):
            val_fn = comp(t.values)
            return lambda v: {k: val_fn(x) for k, x in v.items()}
        if isinstance(t, AvroUnion):
            nn = t.non_null_members
            if len(nn) == 1:
                key = _branch_json_key(nn[0])
                m_fn = comp(nn[0])
                return lambda v: None if v is None else {key: m_fn(v)}
            branches = [
                (name, _branch_json_key(m), comp(m))
                for name, m in zip(union_field_names(t), nn)
            ]
            branch_keys = [_branch_json_key(m) for m in nn]

            def jv_union(v):
                if v is None:
                    return None
                for name, key, fn in branches:
                    inner = v.get(name)
                    if inner is not None:
                        return {key: fn(inner)}
                raise DatumError(
                    f"non-null union value {v!r} matches no branch of {branch_keys}"
                )

            return jv_union
        if isinstance(t, AvroRecord):
            field_fns = [(f.name, comp(f.type)) for f in t.fields]
            return lambda v: {name: fn(v.get(name)) for name, fn in field_fns}

        def jv_unknown(v):
            raise DatumError(f"cannot serialize against {t!r}")

        return jv_unknown

    return comp(root)


def _compile_semantic_view(root: AvroType, env: dict):
    """Schema-compiled :func:`_semantic_value` (same contract as
    :func:`_compile_json_view`: branch-for-branch mirror of the
    interpreted walk, built once per schema)."""
    named: dict[str, Any] = {}

    def comp(t: AvroType):
        while isinstance(t, AvroRecursionRef):
            fn = named.get(t.fqn)
            if fn is None:
                cell = []
                named[t.fqn] = lambda v: cell[0](v)
                real = comp(env[t.fqn])
                cell.append(real)
                named[t.fqn] = real
                return real
            return fn
        if isinstance(t, (AvroPrimitive, AvroFixed)):
            logical = t.logical
            if logical is None:
                return lambda v: v
            return lambda v: None if v is None else _lift_semantic(logical, v)
        if isinstance(t, AvroEnum):
            return lambda v: v
        if isinstance(t, AvroArray):
            item_fn = comp(t.items)
            return lambda v: None if v is None else [item_fn(x) for x in v]
        if isinstance(t, AvroMap):
            val_fn = comp(t.values)
            return lambda v: (
                None if v is None else {k: val_fn(x) for k, x in v.items()}
            )
        if isinstance(t, AvroUnion):
            nn = t.non_null_members
            if len(nn) == 1:
                m_fn = comp(nn[0])
                return m_fn if _is_none_preserving(nn[0]) else (
                    lambda v: None if v is None else m_fn(v)
                )
            pairs = [(k, comp(m)) for k, m in zip(union_field_names(t), nn)]

            def sem_union(v):
                if v is None:
                    return None
                return {
                    k: (fn(v[k]) if v.get(k) is not None else None)
                    for k, fn in pairs
                }

            return sem_union
        if isinstance(t, AvroRecord):
            field_fns = [(f.name, comp(f.type)) for f in t.fields]

            def sem_record(v):
                if v is None:
                    return None
                return {name: fn(v[name]) for name, fn in field_fns}

            return sem_record
        tname = type(t).__name__

        def sem_unknown(v):
            if v is None:  # the interpreted walk's top None check comes first
                return None
            raise DatumError(f"cannot lift {tname}")

        return sem_unknown

    return comp(root)


def _is_none_preserving(t: AvroType) -> bool:
    """True when the compiled semantic view for ``t`` already maps
    None → None (saves a wrapper closure for the common nullable case)."""
    return isinstance(
        t, (AvroArray, AvroMap, AvroRecord, AvroUnion)
    ) or (isinstance(t, (AvroPrimitive, AvroFixed)) and t.logical is not None)


def _bytes_to_b64(o: Any) -> str:
    if isinstance(o, (bytes, bytearray, memoryview)):
        return _b64mod.b64encode(bytes(o)).decode("ascii")
    raise TypeError(f"not JSON serializable: {type(o).__name__}")


# ---------------------------------------------------------------------------
# pandas UDFs: Avro-JSON text ⇄ Avro binary
# ---------------------------------------------------------------------------

# Per-process schema caches (r13 optimization): a pandas UDF body runs once
# per Arrow batch, so parse_schema + BinaryCodec-compile + fingerprint were
# paid per batch; these memoize them per (worker process, schema text).
# Bounded: a process sees the handful of schemas its queries register.


@lru_cache(maxsize=256)
def _cached_schema(schema_json: str) -> ParsedSchema:
    return parse_schema(schema_json)


@lru_cache(maxsize=256)
def _cached_codec(schema_json: str) -> BinaryCodec:
    return BinaryCodec(_cached_schema(schema_json))


@lru_cache(maxsize=256)
def _cached_json_view(schema_json: str):
    ps = _cached_schema(schema_json)
    return _compile_json_view(ps.root, ps.env)


@lru_cache(maxsize=256)
def _cached_semantic_view(schema_json: str):
    ps = _cached_schema(schema_json)
    return _compile_semantic_view(ps.root, ps.env)


@lru_cache(maxsize=256)
def _cached_pydecoder(schema_json: str):
    """Schema-compiled strict Avro-JSON datum decoder (r14-opt): the
    pydecode reference semantics, compiled once per (process, schema)."""
    from ..codec.pydecode import compile_decoder

    ps = _cached_schema(schema_json)
    return compile_decoder(ps.root, ps.env)


def avro_encode_udf(schema_json: str):
    """Series→Series pandas UDF: strict-decode Avro-JSON text and emit Avro
    binary.  Schema is closed over (parsed once per executor)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def _encode(s: pd.Series) -> pd.Series:
        codec = _cached_codec(schema_json)
        dec_fn = _cached_pydecoder(schema_json)  # r14-opt: compiled, per-process
        return s.map(lambda txt: codec.encode(dec_fn(json.loads(txt))))

    return _encode


def avro_decode_udf(schema_json: str):
    """Series→Series pandas UDF: Avro binary → canonical JSON text of the
    decoded representation."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _decode(s: pd.Series) -> pd.Series:
        codec = _cached_codec(schema_json)
        json_view = _cached_json_view(schema_json)
        return s.map(
            lambda b: dumps_avro_json(json_view(codec.decode(bytes(b))))
        )

    return _decode


def avro_encode(col: Column | str, schema_json: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return avro_encode_udf(schema_json)(c)


def avro_decode(col: Column | str, schema_json: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return avro_decode_udf(schema_json)(c)


# ---------------------------------------------------------------------------
# single-object encoding (Avro spec: 0xC3 0x01 marker + CRC-64-AVRO
# fingerprint, little-endian + binary body) — the framing schema registries
# and message buses use to pair a datum with its schema identity
# ---------------------------------------------------------------------------

SINGLE_OBJECT_MAGIC = b"\xc3\x01"


@lru_cache(maxsize=256)
def _single_object_header(schema_json: str) -> bytes:
    from ..schema.fingerprint import schema_fingerprint

    return SINGLE_OBJECT_MAGIC + schema_fingerprint(schema_json, "CRC-64-AVRO")


def single_object_encode_udf(schema_json: str):
    """Series→Series pandas UDF: Avro-JSON text → single-object-encoded
    binary (10-byte header + Avro binary body)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def _encode(s: pd.Series) -> pd.Series:
        codec = _cached_codec(schema_json)
        header = _single_object_header(schema_json)
        dec_fn = _cached_pydecoder(schema_json)  # r14-opt: compiled, per-process
        return s.map(lambda txt: header + codec.encode(dec_fn(json.loads(txt))))

    return _encode


def single_object_decode_udf(schema_json: str):
    """Series→Series pandas UDF: single-object binary → canonical JSON text.

    Validates the 2-byte marker and that the embedded fingerprint matches
    ``schema_json`` (a mismatch means the message was written with a
    different schema — surfacing it as :class:`DatumError` is the
    single-schema reader's contract; a registry-backed reader would
    dispatch on the fingerprint instead)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _decode(s: pd.Series) -> pd.Series:
        codec = _cached_codec(schema_json)
        json_view = _cached_json_view(schema_json)
        header = _single_object_header(schema_json)

        def one(b) -> str:
            buf = bytes(b)
            if len(buf) < 10 or buf[:2] != SINGLE_OBJECT_MAGIC:
                raise DatumError("not a single-object-encoded Avro message")
            if buf[2:10] != header[2:]:
                raise DatumError(
                    f"schema fingerprint mismatch: message {buf[2:10].hex()}, "
                    f"reader {header[2:].hex()}"
                )
            return dumps_avro_json(json_view(codec.decode(buf[10:])))

        return s.map(one)

    return _decode


def avro_decode_permissive_udf(schema_json: str):
    """Series→Series pandas UDF: Avro binary → struct(value json, error).

    The binary-path analogue of the JSON decoder's permissive mode: corrupt
    wire input (truncated varints, overrun slices, bad union/enum indices —
    all surfaced as :class:`DatumError` by the codec) lands in the error
    channel instead of failing the job; trailing garbage after a complete
    datum is likewise an error."""
    from pyspark.sql.functions import pandas_udf

    out_t = T.StructType(
        [
            T.StructField("value", T.StringType(), True),
            T.StructField("error", T.StringType(), True),
        ]
    )

    @pandas_udf(out_t)
    def _decode(s: pd.Series) -> pd.DataFrame:
        codec = _cached_codec(schema_json)
        json_view = _cached_json_view(schema_json)
        values, errors = [], []
        for b in s:
            try:
                values.append(dumps_avro_json(json_view(codec.decode(bytes(b)))))
                errors.append(None)
            except DatumError as ex:
                values.append(None)
                errors.append(f"DatumError: {ex}")
        return pd.DataFrame({"value": values, "error": errors})

    return _decode


def avro_decode_permissive(col: Column | str, schema_json: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return avro_decode_permissive_udf(schema_json)(c)


def single_object_encode(col: Column | str, schema_json: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return single_object_encode_udf(schema_json)(c)


def single_object_decode(col: Column | str, schema_json: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return single_object_decode_udf(schema_json)(c)


def _lift_semantic(logical, x):
    out = py_carrier_to_value(logical, x)
    # instant-semantics timestamps land as TimestampType (LTZ):
    # Arrow struct conversion requires tz-aware values there (naive
    # ones only pass for the *-local NTZ variants).  Sessions are
    # pinned UTC, so the wall clock IS the instant.
    if logical.name in ("timestamp-millis", "timestamp-micros"):
        return out.replace(tzinfo=_dt.timezone.utc)
    return out


def _semantic_value(t, v, env):
    """Carrier-space decoded value (BinaryCodec output) → semantic Python
    value in the shape ``to_struct_type`` declares (logical carriers
    lifted via ``py_carrier_to_value``; unions in the engine's decoded
    representation).  The Python mirror of the expression decoder's
    ``_lift_logical`` — what lets a pandas UDF emit the typed struct
    directly instead of round-tripping through JSON text."""
    lift = _lift_semantic

    while isinstance(t, AvroRecursionRef):
        t = env[t.fqn]
    if v is None:
        return None
    if isinstance(t, AvroPrimitive):
        return lift(t.logical, v) if t.logical is not None else v
    if isinstance(t, AvroFixed):
        return lift(t.logical, v) if t.logical is not None else v
    if isinstance(t, AvroEnum):
        return v
    if isinstance(t, AvroArray):
        return [_semantic_value(t.items, x, env) for x in v]
    if isinstance(t, AvroMap):
        return {k: _semantic_value(t.values, x, env) for k, x in v.items()}
    if isinstance(t, AvroUnion):
        nn = t.non_null_members
        if len(nn) == 1:
            return _semantic_value(nn[0], v, env)
        names = union_field_names(t)
        return {
            k: (_semantic_value(nn[i], v[k], env) if v.get(k) is not None else None)
            for i, k in enumerate(names)
        }
    if isinstance(t, AvroRecord):
        return {f.name: _semantic_value(f.type, v[f.name], env) for f in t.fields}
    raise DatumError(f"cannot lift {type(t).__name__}")


def _nullable_type(dt: T.DataType) -> T.DataType:
    """Recursively nullable, metadata-free copy of a Catalyst type.
    pandas→Arrow batches carry neither non-null flags nor field metadata,
    and Spark 4's pandas_udf struct check compares schemas EXACTLY (the
    mismatch error prints two visually identical types when only
    nullability/metadata differ)."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _nullable_type(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_nullable_type(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(dt.keyType, _nullable_type(dt.valueType), True)
    return dt


def _typed_frame(rows: list, field_names: list[str], out_t: T.StructType) -> pd.DataFrame:
    """Row dicts → the pandas frame Arrow will accept for ``out_t``.
    Struct-returning pandas UDFs get an EXACT Arrow schema check (no
    ns→us coercion like scalar returns): top-level timestamp columns must
    be datetime64[us] — tz-aware for LTZ, naive for NTZ."""
    df = pd.DataFrame(rows, columns=field_names)
    for f in out_t.fields:
        if isinstance(f.dataType, T.TimestampType):
            df[f.name] = pd.to_datetime(df[f.name], utc=True).astype("datetime64[us, UTC]")
        elif isinstance(f.dataType, T.TimestampNTZType):
            df[f.name] = pd.to_datetime(df[f.name]).astype("datetime64[us]")
    return df


def single_object_decode_typed_udf(schema_json: str):
    """Series→DataFrame pandas UDF: single-object binary → the TYPED
    struct directly (one Arrow hop), skipping the JSON text round-trip of
    :func:`single_object_decode_udf` + ``decode_json``.

    Same validation contract as the JSON-hop path — framing marker and
    embedded-fingerprint checks raise :class:`DatumError` — and the body
    needs no re-validation: binary decode is schema-directed, so a
    successfully decoded datum IS well-typed (the JSON hop merely
    re-checked the codec's own output).  Use for the consumption hot
    path; the JSON hop remains the route when downstream wants the
    permissive error channel or text for auditing."""
    from pyspark.sql.functions import pandas_udf

    from ..schema.spark_convert import to_struct_type

    _ps = parse_schema(schema_json)
    # all-nullable copy: pandas→Arrow batches always carry nullable
    # fields, and Spark 4 rejects the schema otherwise (nullability here
    # is metadata — required-field enforcement happened at binary decode)
    out_t = _nullable_type(to_struct_type(_ps.root, _ps.env))
    if not isinstance(_ps.root, AvroRecord):
        raise DatumError("typed decode requires a record root schema")
    field_names = [f.name for f in _ps.root.fields]

    @pandas_udf(out_t)
    def _decode(s: pd.Series) -> pd.DataFrame:
        codec = _cached_codec(schema_json)
        semantic = _cached_semantic_view(schema_json)
        header = _single_object_header(schema_json)
        rows = []
        for b in s:
            buf = bytes(b)
            if len(buf) < 10 or buf[:2] != SINGLE_OBJECT_MAGIC:
                raise DatumError("not a single-object-encoded Avro message")
            if buf[2:10] != header[2:]:
                raise DatumError(
                    f"schema fingerprint mismatch: message {buf[2:10].hex()}, "
                    f"reader {header[2:].hex()}"
                )
            rows.append(semantic(codec.decode(buf[10:])))
        return _typed_frame(rows, field_names, out_t)

    return _decode


def single_object_decode_typed(col: Column | str, schema_json: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return single_object_decode_typed_udf(schema_json)(c)


def single_object_decode_registry_typed_udf(writer_schemas: list[str], reader_schema: str):
    """Typed variant of :func:`single_object_decode_registry_udf`: dispatch
    each message to its writer schema by the embedded CRC-64-AVRO
    fingerprint, resolve writer→reader (codec/evolve.resolve_datum), and
    emit the reader-shaped TYPED struct straight from the Arrow batch —
    the registry consumption hot path without the JSON round-trip.
    Unknown fingerprints raise DatumError, as in the JSON-hop variant."""
    from pyspark.sql.functions import pandas_udf

    from ..schema.spark_convert import to_struct_type

    _rps = parse_schema(reader_schema)
    if not isinstance(_rps.root, AvroRecord):
        raise DatumError("typed decode requires a record root schema")
    out_t = _nullable_type(to_struct_type(_rps.root, _rps.env))
    field_names = [f.name for f in _rps.root.fields]

    @pandas_udf(out_t)
    def _decode(s: pd.Series) -> pd.DataFrame:
        from ..codec.evolve import resolve_datum

        rps = _cached_schema(reader_schema)
        semantic = _cached_semantic_view(reader_schema)
        by_fp = {}
        for wjson in writer_schemas:
            by_fp[_single_object_header(wjson)[2:]] = (
                _cached_schema(wjson),
                _cached_codec(wjson),
            )
        rows = []
        for b in s:
            buf = bytes(b)
            if len(buf) < 10 or buf[:2] != SINGLE_OBJECT_MAGIC:
                raise DatumError("not a single-object-encoded Avro message")
            entry = by_fp.get(buf[2:10])
            if entry is None:
                raise DatumError(f"unknown schema fingerprint {buf[2:10].hex()}")
            wps, codec = entry
            out = resolve_datum(codec.decode(buf[10:]), wps.root, rps.root, rps.env, wps.env)
            rows.append(semantic(out))
        return _typed_frame(rows, field_names, out_t)

    return _decode


def single_object_decode_registry_typed(
    col: Column | str, writer_schemas: list[str], reader_schema: str
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return single_object_decode_registry_typed_udf(writer_schemas, reader_schema)(c)


def confluent_decode_registry_typed_udf(schemas_by_id: dict[int, str], reader_schema: str):
    """Typed variant of :func:`confluent_decode_registry_udf`: Confluent
    5-byte framing (0x00 + BE id) dispatched by id, resolved writer→reader,
    emitted as ``struct(schema_id int, value struct<reader>)`` — the id
    stays a column for producer-version auditing, the body skips the JSON
    round-trip."""
    from pyspark.sql.functions import pandas_udf

    from ..schema.spark_convert import to_struct_type

    _rps = parse_schema(reader_schema)
    if not isinstance(_rps.root, AvroRecord):
        raise DatumError("typed decode requires a record root schema")
    value_t = _nullable_type(to_struct_type(_rps.root, _rps.env))
    out_t = T.StructType(
        [
            T.StructField("schema_id", T.IntegerType(), True),
            T.StructField("value", value_t, True),
        ]
    )

    @pandas_udf(out_t)
    def _decode(s: pd.Series) -> pd.DataFrame:
        from ..codec.evolve import resolve_datum

        rps = _cached_schema(reader_schema)
        semantic = _cached_semantic_view(reader_schema)
        by_id = {}
        for sid, wjson in schemas_by_id.items():
            by_id[int(sid)] = (_cached_schema(wjson), _cached_codec(wjson))
        ids, values = [], []
        for b in s:
            buf = bytes(b)
            if len(buf) < 5 or buf[:1] != CONFLUENT_MAGIC:
                raise DatumError("not a Confluent-framed message (magic byte != 0x00)")
            sid = _struct.unpack(">I", buf[1:5])[0]
            entry = by_id.get(sid)
            if entry is None:
                raise DatumError(f"schema id {sid} not in registry map")
            wps, codec = entry
            out = resolve_datum(codec.decode(buf[5:]), wps.root, rps.root, rps.env, wps.env)
            ids.append(sid)
            values.append(semantic(out))
        return pd.DataFrame(
            {"schema_id": pd.array(ids, dtype="Int32"), "value": values}
        )

    return _decode


def confluent_decode_registry_typed(
    col: Column | str, schemas_by_id: dict[int, str], reader_schema: str
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return confluent_decode_registry_typed_udf(schemas_by_id, reader_schema)(c)


def single_object_decode_registry_udf(writer_schemas: list[str], reader_schema: str):
    """Series→Series pandas UDF: single-object binary → reader-shaped JSON,
    dispatching each message to its writer schema by the embedded
    CRC-64-AVRO fingerprint — the full schema-registry consumption path
    (a stream interleaving messages from several schema versions reads as
    one uniform relation).  Unknown fingerprints raise DatumError."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _decode(s: pd.Series) -> pd.Series:
        from ..codec.evolve import resolve_datum

        rps = _cached_schema(reader_schema)
        json_view = _cached_json_view(reader_schema)
        by_fp = {}
        for wjson in writer_schemas:
            by_fp[_single_object_header(wjson)[2:]] = (
                _cached_schema(wjson),
                _cached_codec(wjson),
            )

        def one(b) -> str:
            buf = bytes(b)
            if len(buf) < 10 or buf[:2] != SINGLE_OBJECT_MAGIC:
                raise DatumError("not a single-object-encoded Avro message")
            entry = by_fp.get(buf[2:10])
            if entry is None:
                raise DatumError(f"unknown schema fingerprint {buf[2:10].hex()}")
            wps, codec = entry
            v = codec.decode(buf[10:])
            out = resolve_datum(v, wps.root, rps.root, rps.env, wps.env)
            return dumps_avro_json(json_view(out))

        return s.map(one)

    return _decode


def single_object_decode_registry(
    col: Column | str, writer_schemas: list[str], reader_schema: str
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return single_object_decode_registry_udf(writer_schemas, reader_schema)(c)


def single_object_decode_permissive_udf(schema_json: str):
    """Series→Series pandas UDF: single-object binary → struct(value json,
    error).  The dead-letter variant of :func:`single_object_decode_udf`:
    framing defects (bad magic, short header, fingerprint mismatch) and
    body defects (truncated varints, overruns, bad indices) land in the
    error channel instead of failing the batch — the PERMISSIVE contract a
    long-running stream consumer needs (one poisoned message must not kill
    the query)."""
    from pyspark.sql.functions import pandas_udf

    out_t = T.StructType(
        [
            T.StructField("value", T.StringType(), True),
            T.StructField("error", T.StringType(), True),
        ]
    )

    @pandas_udf(out_t)
    def _decode(s: pd.Series) -> pd.DataFrame:
        codec = _cached_codec(schema_json)
        json_view = _cached_json_view(schema_json)
        header = _single_object_header(schema_json)
        values, errors = [], []
        for b in s:
            try:
                buf = bytes(b)
                if len(buf) < 10 or buf[:2] != SINGLE_OBJECT_MAGIC:
                    raise DatumError("not a single-object-encoded Avro message")
                if buf[2:10] != header[2:]:
                    raise DatumError(
                        f"schema fingerprint mismatch: message {buf[2:10].hex()}, "
                        f"reader {header[2:].hex()}"
                    )
                values.append(dumps_avro_json(json_view(codec.decode(buf[10:]))))
                errors.append(None)
            except DatumError as ex:
                values.append(None)
                errors.append(f"DatumError: {ex}")
        return pd.DataFrame({"value": values, "error": errors})

    return _decode


def single_object_decode_permissive(col: Column | str, schema_json: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return single_object_decode_permissive_udf(schema_json)(c)


# ---------------------------------------------------------------------------
# Confluent Schema Registry wire format: magic byte 0x00 + 4-byte BIG-endian
# schema id + Avro binary body.  This is the framing every Kafka producer
# using Confluent's serializers emits — distinct from the Avro spec's
# single-object encoding above (0xC3 0x01 + little-endian CRC-64-AVRO
# fingerprint).  The reference roadmap names "Schemaregistry support"
# (/root/reference/README.md:25); format per Confluent's public wire-format
# documentation.  Ids are registry-assigned integers; the consumer resolves
# id → writer schema via its subject map (here: a closed-over dict standing
# in for the registry client's id cache).
# ---------------------------------------------------------------------------

CONFLUENT_MAGIC = b"\x00"


def confluent_header(schema_id: int) -> bytes:
    """5-byte Confluent frame header: 0x00 + big-endian uint32 schema id."""
    if not 0 <= schema_id <= 0xFFFFFFFF:
        raise DatumError(f"schema id {schema_id} out of uint32 range")
    return CONFLUENT_MAGIC + _struct.pack(">I", schema_id)


def confluent_encode_udf(schema_json: str, schema_id: int):
    """Series→Series pandas UDF: Avro-JSON text → Confluent-framed binary
    (5-byte header + Avro binary body), as a registry-registered producer
    with the given id would emit."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.BinaryType())
    def _encode(s: pd.Series) -> pd.Series:
        codec = _cached_codec(schema_json)
        header = confluent_header(schema_id)
        dec_fn = _cached_pydecoder(schema_json)  # r14-opt: compiled, per-process
        return s.map(lambda txt: header + codec.encode(dec_fn(json.loads(txt))))

    return _encode


def confluent_decode_registry_udf(schemas_by_id: dict[int, str], reader_schema: str):
    """Series→Series pandas UDF: Confluent-framed binary →
    struct(schema_id int, json string) under the reader schema.

    Each message dispatches to its writer schema by the embedded 4-byte id
    (the id cache a Confluent deserializer keeps after resolving ids against
    the registry), then resolves writer→reader via the engine's schema
    evolution (codec/evolve.py) — so a topic interleaving several registered
    versions reads as one uniform reader-shaped relation, with the writer id
    surfaced as a column (consumers routinely audit which producers are on
    which version).  Unknown ids and bad magic raise DatumError — use
    :func:`confluent_decode_registry_permissive_udf` for the dead-letter
    variant."""
    from pyspark.sql.functions import pandas_udf

    out_t = T.StructType(
        [
            T.StructField("schema_id", T.IntegerType(), True),
            T.StructField("json", T.StringType(), True),
        ]
    )

    @pandas_udf(out_t)
    def _decode(s: pd.Series) -> pd.DataFrame:
        from ..codec.evolve import resolve_datum

        rps = _cached_schema(reader_schema)
        json_view = _cached_json_view(reader_schema)
        by_id = {}
        for sid, wjson in schemas_by_id.items():
            by_id[int(sid)] = (_cached_schema(wjson), _cached_codec(wjson))

        ids, jsons = [], []
        for b in s:
            sid, txt = _confluent_one(bytes(b), by_id, rps, resolve_datum, json_view)
            ids.append(sid)
            jsons.append(txt)
        return pd.DataFrame({"schema_id": pd.array(ids, dtype="Int32"), "json": jsons})

    return _decode


def _confluent_one(buf: bytes, by_id, rps, resolve_datum, json_view=None) -> tuple[int, str]:
    """Decode one Confluent-framed message; shared by strict + permissive.
    ``by_id`` is a dict (static id map) or any object with a dict-shaped
    ``get`` whose miss may raise DatumError itself (the registry-client
    resolver does, so an id unknown to the *registry* dead-letters with
    the same contract as an id missing from a static map)."""
    if len(buf) < 5 or buf[:1] != CONFLUENT_MAGIC:
        raise DatumError("not a Confluent-framed message (magic byte != 0x00)")
    sid = _struct.unpack(">I", buf[1:5])[0]
    entry = by_id.get(sid)
    if entry is None:
        raise DatumError(f"schema id {sid} not in registry map")
    wps, codec = entry
    v = codec.decode(buf[5:])
    out = resolve_datum(v, wps.root, rps.root, rps.env, wps.env)
    if json_view is None:
        return sid, dumps_avro_json(as_avro_json(rps.root, out, rps.env))
    return sid, dumps_avro_json(json_view(out))


class _ClientIdResolver:
    """id -> (ParsedSchema, BinaryCodec) through a SchemaRegistryClient,
    memoizing parsed schemas per UDF instance (the client itself memoizes
    the JSON per process).  Registry id-miss becomes DatumError so the
    permissive path dead-letters it like any other poisoned frame; network
    failures stay SchemaRegistryError — those must fail the batch (retry),
    not silently dead-letter healthy messages."""

    def __init__(self, client) -> None:
        self._client = client
        self._cache: dict[int, tuple] = {}

    def get(self, sid: int):
        from ..sources.schema_registry import SchemaNotFoundError

        entry = self._cache.get(sid)
        if entry is None:
            try:
                wjson = self._client.schema_by_id(sid)
            except SchemaNotFoundError as ex:
                raise DatumError(f"schema id {sid} not in registry") from ex
            entry = self._cache[sid] = (_cached_schema(wjson), _cached_codec(wjson))
        return entry


def confluent_decode_client_udf(base_url: str, reader_schema: str, permissive: bool = False):
    """Registry-client-backed variant of the Confluent decode UDFs: writer
    schemas resolve by id against the Schema Registry REST API
    (sources/schema_registry.py — LRU id cache, retries) instead of a
    static id map, which is what a long-lived consumer actually does when
    a producer rolls a new version mid-stream.  One client per (process,
    base_url) so the cache amortizes across Arrow batches and partitions.
    ``permissive``: unknown-id / framing / body defects populate an
    ``error`` column (dead-letter) instead of failing the batch."""
    from pyspark.sql.functions import pandas_udf

    fields = [
        T.StructField("schema_id", T.IntegerType(), True),
        T.StructField("json", T.StringType(), True),
    ]
    if permissive:
        fields.append(T.StructField("error", T.StringType(), True))
    out_t = T.StructType(fields)

    @pandas_udf(out_t)
    def _decode(s: pd.Series) -> pd.DataFrame:
        from ..codec.evolve import resolve_datum
        from ..sources.schema_registry import process_client

        rps = _cached_schema(reader_schema)
        json_view = _cached_json_view(reader_schema)
        resolver = _ClientIdResolver(process_client(base_url))
        ids, jsons, errors = [], [], []
        for b in s:
            buf = bytes(b)
            sid = None
            try:
                if len(buf) >= 5 and buf[:1] == CONFLUENT_MAGIC:
                    sid = _struct.unpack(">I", buf[1:5])[0]
                sid, txt = _confluent_one(buf, resolver, rps, resolve_datum, json_view)
                ids.append(sid)
                jsons.append(txt)
                errors.append(None)
            except DatumError as ex:
                if not permissive:
                    raise
                ids.append(sid)
                jsons.append(None)
                errors.append(f"DatumError: {ex}")
        out = {"schema_id": pd.array(ids, dtype="Int32"), "json": jsons}
        if permissive:
            out["error"] = errors
        return pd.DataFrame(out)

    return _decode


def confluent_decode_client(
    col: Column | str, base_url: str, reader_schema: str, permissive: bool = False
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return confluent_decode_client_udf(base_url, reader_schema, permissive)(c)


def confluent_decode_registry_permissive_udf(
    schemas_by_id: dict[int, str], reader_schema: str
):
    """Dead-letter variant of :func:`confluent_decode_registry_udf`:
    struct(schema_id, json, error) — framing/id/body defects populate
    ``error`` instead of failing the batch (schema_id is still surfaced
    when the header parsed, for routing poisoned messages by producer)."""
    from pyspark.sql.functions import pandas_udf

    out_t = T.StructType(
        [
            T.StructField("schema_id", T.IntegerType(), True),
            T.StructField("json", T.StringType(), True),
            T.StructField("error", T.StringType(), True),
        ]
    )

    @pandas_udf(out_t)
    def _decode(s: pd.Series) -> pd.DataFrame:
        from ..codec.evolve import resolve_datum

        rps = _cached_schema(reader_schema)
        json_view = _cached_json_view(reader_schema)
        by_id = {}
        for sid, wjson in schemas_by_id.items():
            by_id[int(sid)] = (_cached_schema(wjson), _cached_codec(wjson))

        ids, jsons, errors = [], [], []
        for b in s:
            buf = bytes(b)
            sid = None
            try:
                if len(buf) >= 5 and buf[:1] == CONFLUENT_MAGIC:
                    sid = _struct.unpack(">I", buf[1:5])[0]
                _, txt = _confluent_one(buf, by_id, rps, resolve_datum, json_view)
                ids.append(sid)
                jsons.append(txt)
                errors.append(None)
            except DatumError as ex:
                ids.append(sid)
                jsons.append(None)
                errors.append(f"DatumError: {ex}")
        return pd.DataFrame(
            {"schema_id": pd.array(ids, dtype="Int32"), "json": jsons, "error": errors}
        )

    return _decode


# ---------------------------------------------------------------------------
# connector-aware typed decode: native spark-avro where present, engine
# codec everywhere else — one call site for both deployments
# ---------------------------------------------------------------------------


def avro_decode_typed(
    df,
    col: Column | str,
    schema_json: str,
    output_col: str = "decoded",
    _from_avro=None,
):
    """Avro-binary column → typed struct column, routed by deployment:

    * **spark-avro on the classpath** (a real cluster): native
      ``from_avro(col, avsc)`` — JVM-side, codegen, zero Python.  The
      schema passed is the engine's *normalized* avsc (parse → print
      round-trip through ``schema/printer.to_avsc``), so engine-validated
      schemas with aliases/defaults/logical types reach the connector in
      canonical form.
    * **connector absent** (this sandbox, plain pip installs): the
      pure-Python binary codec decodes to canonical JSON, and the strict
      expression decoder (``codec.decoder.decode_json``) lifts it to the
      same typed struct — differential-tested against org.apache.avro in
      tests/test_avro_binary.py.

    ``_from_avro`` is the injectable native entry point: tests exercise the
    native branch's argument construction without the connector (VERDICT r3
    item #6 — the first cluster run must not be the first execution of this
    branch); production leaves it None and the probe decides.

    Struct-shape caveat, documented not hidden: for multi-member unions the
    two branches differ (spark-avro emits member0/member1 fields; the
    engine emits collision-qualified ``union_field_names``).  For the
    record/primitive/logical schemas message pipelines actually register,
    the shapes agree."""
    from ..codec.decoder import decode_json
    from ..sources.registry import avro_available

    c = F.col(col) if isinstance(col, str) else col
    if _from_avro is None and avro_available(df.sparkSession):
        from pyspark.sql.avro.functions import from_avro as _from_avro
    if _from_avro is not None:
        from ..schema.printer import to_avsc

        ps = parse_schema(schema_json)
        return df.withColumn(output_col, _from_avro(c, to_avsc(ps.root)))
    tmp = "_anglerfish_avro_json"
    return (
        decode_json(
            df.withColumn(tmp, avro_decode_udf(schema_json)(c)),
            tmp,
            schema_json,
            output_col=output_col,
        ).drop(tmp)
    )


def avro_encode_typed(
    df,
    col: Column | str,
    schema_json: str,
    output_col: str = "encoded",
    _to_avro=None,
):
    """Typed struct column → Avro-binary column, routed by deployment
    (r13 — VERDICT r12 #6, the encode twin of :func:`avro_decode_typed`):

    * **spark-avro on the classpath**: native ``to_avro(col, avsc)`` —
      JVM-side, codegen, zero Python; the schema is the engine's
      normalized avsc.
    * **connector absent** (this sandbox): ``F.to_json`` lowers the
      struct to JSON and the pure-Python binary codec encodes it — the
      differential reference the native branch is tested against.

    ``_to_avro`` is the injectable native entry point (same seam
    contract as ``avro_decode_typed``); production leaves it None and
    the capability probe decides.

    Shape caveat (same as the decode twin): the JSON fallback encodes
    plain-JSON shapes, which equal Avro-JSON for the record / primitive
    / logical schemas message pipelines register; multi-member non-null
    unions need the native branch (their Avro-JSON wrapping differs)."""
    from ..sources.registry import avro_available

    c = F.col(col) if isinstance(col, str) else col
    if _to_avro is None and avro_available(df.sparkSession):
        from pyspark.sql.avro.functions import to_avro as _to_avro
    if _to_avro is not None:
        from ..schema.printer import to_avsc

        ps = parse_schema(schema_json)
        return df.withColumn(output_col, _to_avro(c, to_avsc(ps.root)))
    return df.withColumn(
        output_col, avro_encode_udf(schema_json)(F.to_json(c))
    )


def confluent_encode(col: Column | str, schema_json: str, schema_id: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return confluent_encode_udf(schema_json, schema_id)(c)


def confluent_decode_registry(
    col: Column | str, schemas_by_id: dict[int, str], reader_schema: str
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return confluent_decode_registry_udf(schemas_by_id, reader_schema)(c)


def confluent_decode_registry_permissive(
    col: Column | str, schemas_by_id: dict[int, str], reader_schema: str
) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return confluent_decode_registry_permissive_udf(schemas_by_id, reader_schema)(c)
