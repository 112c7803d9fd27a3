"""Function surface: Avro binary codec UDFs + scalar helpers.

The relational scalar-function surface (string/date/math/array) is the
stock ``pyspark.sql.functions`` namespace — deliberately not wrapped; the
engine adds only what Spark lacks.
"""

from .avro_binary import BinaryCodec, avro_decode, avro_encode

__all__ = ["BinaryCodec", "avro_decode", "avro_encode"]
