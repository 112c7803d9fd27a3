"""anglerfish_spark — a PySpark-native, schema-first analytics engine.

A from-scratch re-expression of the capabilities of the reference library
GrafBlutwurst/Anglerfish (an Avro/JSON schema + codec library, see
/root/reference/README.md:5-18) on top of Apache Spark:

* ``anglerfish_spark.schema``   — avsc parsing/printing, named refs, recursion
  unrolling, ``StructType`` interop (reference S1/S2/I1-I3 semantics).
* ``anglerfish_spark.codec``    — strict schema-directed JSON decode with the
  reference's error taxonomy (D1-D9, E1).
* ``anglerfish_spark.operators``— relational + LLM-pipeline operator surface
  (joins/aggs/windows, dedup, similarity, text analysis) built on the
  DataFrame API so Catalyst/AQE own the physical plan.
* ``anglerfish_spark.streaming``— event-time windows (tumble/slide/session)
  usable both in batch and Structured Streaming.
* ``anglerfish_spark.sources``  — dataset registry / IO helpers.

Everything is DataFrame-first: logical plans are declared with built-in
``pyspark.sql.functions`` so predicate pushdown, column pruning and
whole-stage codegen apply; Python UDFs are used only where Catalyst cannot
express the semantics (none on the hot paths).
"""

__version__ = "0.2.0"


def __getattr__(name: str):
    """Top-level facade: the API a reference user reaches for first, lazily
    resolved so schema-only tooling never imports pyspark-dependent
    modules."""
    front_end = {
        "parse_schema": ("anglerfish_spark.schema", "parse_schema"),
        "to_avsc": ("anglerfish_spark.schema", "to_avsc"),
        "to_struct_type": ("anglerfish_spark.schema", "to_struct_type"),
        "from_struct_type": ("anglerfish_spark.schema", "from_struct_type"),
        "parsing_canonical_form": ("anglerfish_spark.schema.fingerprint", "parsing_canonical_form"),
        "schema_fingerprint": ("anglerfish_spark.schema.fingerprint", "schema_fingerprint"),
        "decode_json": ("anglerfish_spark.codec", "decode_json"),
        "decode_datum": ("anglerfish_spark.codec", "decode_datum"),
        "decode_json_evolved": ("anglerfish_spark.codec.evolve", "decode_json_evolved"),
        "evolve_struct": ("anglerfish_spark.codec.evolve", "evolve_struct"),
        "resolve_datum": ("anglerfish_spark.codec.evolve", "resolve_datum"),
        "get_spark": ("anglerfish_spark.session", "get_spark"),
        "all_queries": ("anglerfish_spark.registry", "all_queries"),
    }
    if name in front_end:
        import importlib

        module, attr = front_end[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
