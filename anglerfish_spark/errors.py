"""Typed error taxonomy for schema parsing and strict datum decoding.

Mirrors the reference's 15-class error ADT (E1 in SURVEY.md §2.1;
reference: data/avro/AvroJsonFAlgebras.scala:32-52) split into datum-side
and schema-side families.  Engine-side these surface either as raised
Python exceptions (front-end / FAILFAST decode) or as rows in a per-record
``_error`` column (PERMISSIVE decode).
"""

from __future__ import annotations


class AnglerfishError(Exception):
    """Base class for every engine error."""


# --- schema-side errors (raised while parsing an .avsc) ---------------------


class SchemaError(AnglerfishError):
    """Base for schema-parsing errors."""


class UnexpectedJsonTypeError(SchemaError):
    """A JSON node of the wrong kind in a schema position."""


class UnknownSchemaReferenceError(SchemaError):
    """A named-type reference that is not in the environment.

    Mirrors reference AvroJsonFAlgebras.scala:273 (unknown reference lists
    the known refs for debuggability).
    """

    def __init__(self, name: str, known: list[str]):
        self.name = name
        self.known = sorted(known)
        super().__init__(f"unknown schema reference {name!r}; known: {self.known}")


class UnexpectedParsingResultError(SchemaError):
    """Schema text parsed to something that is not a type."""


class InvalidParserStateError(SchemaError):
    """Internal invariant violation during schema parsing."""


class UnknownFieldError(SchemaError):
    """A required attribute is missing from a schema object (e.g. no 'type')."""


class RefinementError(SchemaError):
    """A name/namespace failed refinement validation (reference AvroData.scala:21-31)."""


class UnknownSortOrderError(SchemaError):
    """Field 'order' attribute outside {ascending, descending, ignore}."""


# --- datum-side errors (strict decode) --------------------------------------


class DatumError(AnglerfishError):
    """Base for strict-decode errors."""

    #: short stable code used in the PERMISSIVE-mode error column
    code = "DatumError"


class EnumError(DatumError):
    """Value not in the enum's symbol set."""

    code = "EnumError"


class UnionError(DatumError):
    """Union datum malformed (e.g. not a single-key object, null not allowed)."""

    code = "UnionError"


class UnionResolutionError(DatumError):
    """Union branch key resolves to no (or multiple) members."""

    code = "UnionResolutionError"


class ArrayError(DatumError):
    code = "ArrayError"


class RecordError(DatumError):
    """Missing required field, or extra field not in the schema."""

    code = "RecordError"


class FixedError(DatumError):
    """Fixed value with the wrong byte length."""

    code = "FixedError"


class UnexpectedTypeError(DatumError):
    """JSON node kind does not match the schema node."""

    code = "UnexpectedTypeError"


class UnrepresentableError(DatumError):
    """Numeric value outside the target type's exact range (D3 semantics)."""

    code = "UnrepresentableError"


class SchemaEvolutionError(SchemaError):
    """Reader schema cannot be resolved against the writer schema."""


class ConvergenceError(AnglerfishError):
    """An iterative distributed algorithm exhausted its round budget
    without reaching a fixed point (results would be silently partial)."""
