"""Multimodal columns: opaque binary payloads + typed metadata, with
feature extraction as Arrow-batched ``mapInPandas``.

The pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column (or a reference into object storage) next to typed
metadata; run decode/resize/frame-sample as ``mapInPandas`` stages so bytes
move through Arrow record batches, never row-at-a-time Python.  Partitioning
guidance: payload tables should be partitioned by size-balanced keys
(payload bytes dominate task skew, not row counts).

The actual media decode is STUBBED here (no imaging libs in this
container): :func:`decode_image` raises ``NotImplementedError`` and the
pipeline uses :func:`fake_features` — a deterministic byte-level feature
extractor — so the Spark-side plumbing (schema, batching, UDF signature)
is real and oracle-checked end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..session import prepare
from ..sources.registry import load_table

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("checksum16", T.IntegerType(), False),
    ]
)


def decode_image(payload: bytes):
    """Decode an image payload to pixels.

    STUB: imaging libraries are unavailable in this environment; on a real
    cluster this would Pillow/torchvision-decode inside the same
    ``mapInPandas`` batch loop (bytes already in Arrow memory).
    """
    raise NotImplementedError("media decode requires imaging libs; see fake_features")


def fake_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in feature extractor over binary payloads:
    byte length, first byte, and a 16-byte-prefix checksum."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "first_byte": payloads.map(lambda b: b[0] if len(b) else None).astype("Int32"),
                "checksum16": payloads.map(lambda b: sum(b[:16]) % 256).astype("int32"),
            }
        )


def extract_features(df: DataFrame) -> DataFrame:
    """Run the (stubbed) feature extractor over ``(doc_id, payload)`` rows
    via Arrow-batched ``mapInPandas``."""
    return df.mapInPandas(fake_features, FEATURE_SCHEMA)


@query(
    "q_multimodal_features",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       ascii(substring(text, 1, 1)) AS first_byte,
       CAST(list_sum([ascii(substring(text, i, 1))
                      for i in generate_series(1, LEAST(LENGTH(text), 16))]) % 256
            AS INT) AS checksum16
FROM documents
ORDER BY doc_id
""",
    group="llm-multimodal",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction end-to-end: text → binary payload
    (stand-in for an image blob) → mapInPandas features.  The oracle
    recomputes the same features from the text (ASCII corpus, so byte
    values equal character codes)."""
    prepare(spark)
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return extract_features(payloads)
