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

__version__ = "0.1.0"
