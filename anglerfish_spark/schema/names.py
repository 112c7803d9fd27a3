"""Avro name validation and FQN handling.

Reference semantics: names are refinement-typed with regex
``[A-Za-z_][A-Za-z0-9_]*`` (reference data/avro/AvroData.scala:21), dotted
namespaces validate each segment (AvroData.scala:23-31), and the fully
qualified name is ``namespace + "." + name`` (data/avro/Util.scala:15-16).
Violations raise :class:`RefinementError` — the engine analogue of the
reference's refined-types failure channel
(core/refinedExtensions/Refinement.scala:11-12).
"""

from __future__ import annotations

import re

from ..errors import RefinementError

NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

#: the 8 primitive type names (reference AvroData.scala:41-49)
PRIMITIVE_NAMES = ("null", "boolean", "int", "long", "float", "double", "bytes", "string")


def validate_name(name: str) -> str:
    if not isinstance(name, str) or not NAME_RE.match(name):
        raise RefinementError(f"invalid avro name {name!r} (must match {NAME_RE.pattern})")
    return name


def validate_namespace(ns: str) -> str:
    if not isinstance(ns, str) or not ns or not all(NAME_RE.match(p) for p in ns.split(".")):
        raise RefinementError(f"invalid avro namespace {ns!r}")
    return ns


def construct_fqn(namespace: str | None, name: str) -> str:
    """FQN construction (reference Util.scala:15-16)."""
    return f"{namespace}.{name}" if namespace else name


def split_fqn(fqn: str) -> tuple[str | None, str]:
    """Inverse of :func:`construct_fqn`."""
    if "." in fqn:
        ns, _, nm = fqn.rpartition(".")
        return ns, nm
    return None, fqn
