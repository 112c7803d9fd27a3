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


# ---------------------------------------------------------------------------
# resize + frame-sample plumbing (decode stubbed, batch shapes real)
# ---------------------------------------------------------------------------

RESIZE_STRIDE = 4  # stand-in for a resolution downscale factor
FRAME_BYTES = 32  # stand-in frame size of the fake "video" payload
FRAME_STRIDE = 4  # sample every 4th frame


def decode_audio(payload: bytes):
    """Decode an audio payload to samples.  STUB (see :func:`decode_image`);
    on a real cluster: soundfile/torchaudio inside the mapInPandas loop."""
    raise NotImplementedError("media decode requires audio libs; see fake_resize")


def fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for image resize: a stride-k byte subsample
    (1 row in → 1 row out, payload shrinks ~k×) — the exact batch shape of
    a real downscale."""
    for pdf in batches:
        resized = pdf["payload"].map(lambda b: bytes(b[::RESIZE_STRIDE]))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes_out": resized.map(len).astype("int64"),
                "checksum_out": resized.map(lambda b: sum(b) % 256).astype("int32"),
            }
        )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes_out", T.LongType(), False),
        T.StructField("checksum_out", T.IntegerType(), False),
    ]
)


@query(
    "q_multimodal_resize",
    oracle=f"""
SELECT doc_id,
       (LENGTH(text) + {RESIZE_STRIDE - 1}) // {RESIZE_STRIDE} AS n_bytes_out,
       CAST(list_sum([ascii(substring(text, i, 1))
                      for i in generate_series(1, LENGTH(text), {RESIZE_STRIDE})]) % 256
            AS INT) AS checksum_out
FROM documents
ORDER BY doc_id
""",
    group="llm-multimodal",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-shaped mapInPandas stage (1 row → 1 smaller row): payload
    subsampled at a fixed stride, features recomputed on the output bytes.
    The oracle recomputes the same subsample from the ASCII text."""
    prepare(spark)
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(fake_resize, RESIZE_SCHEMA)  # row-level: no trailing sort


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_len", T.LongType(), False),
        T.StructField("checksum", T.IntegerType(), False),
    ]
)


def fake_frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for video frame sampling: the payload is read
    as consecutive FRAME_BYTES-sized frames and every FRAME_STRIDE-th frame
    is emitted (1 row in → many rows out — the fan-out batch shape of real
    frame extraction)."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_len": [], "checksum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            nframes = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
            for fi in range(0, nframes, FRAME_STRIDE):
                frame = b[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(fi)
                out["frame_len"].append(len(frame))
                out["checksum"].append(sum(frame) % 256)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int64"),
                "frame_len": pd.Series(out["frame_len"], dtype="int64"),
                "checksum": pd.Series(out["checksum"], dtype="int32"),
            }
        )


@query(
    "q_multimodal_frames",
    oracle=f"""
WITH fr AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(CEIL(LENGTH(text) / {FRAME_BYTES}.0) AS BIGINT))) AS fi
  FROM documents
)
SELECT doc_id, fi AS frame_idx,
       LEAST({FRAME_BYTES}, LENGTH(text) - fi * {FRAME_BYTES}) AS frame_len,
       CAST(list_sum([ascii(substring(text, fi * {FRAME_BYTES} + i, 1))
                      for i in generate_series(1, LEAST({FRAME_BYTES},
                                                        LENGTH(text) - fi * {FRAME_BYTES}))]) % 256
            AS INT) AS checksum
FROM fr
WHERE fi % {FRAME_STRIDE} = 0
ORDER BY doc_id, frame_idx
""",
    group="llm-multimodal",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling mapInPandas stage (1 row → many rows).  Payload rows
    are range-partitioned by payload size first: a fan-out stage amplifies
    input skew (one giant video → one straggler task), so size-balancing
    BEFORE the explode is the 100 TB-correct shape."""
    prepare(spark)
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    ).repartitionByRange(F.octet_length("payload"), F.col("doc_id"))
    return payloads.mapInPandas(fake_frame_sample, FRAME_SCHEMA)  # row-level: no trailing sort


# ---------------------------------------------------------------------------
# audio-shaped plumbing: windowed sample energy (decode stubbed)
# ---------------------------------------------------------------------------

AUDIO_WINDOW = 16  # stand-in window length (samples) for the energy sweep

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_windows", T.LongType(), False),
        T.StructField("total_energy", T.LongType(), True),
        T.StructField("peak_window", T.IntegerType(), True),
    ]
)


def fake_audio_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for audio analysis: payload bytes as unsigned
    8-bit samples, per-window sum-of-squares energy, peak-window argmax
    (first window wins ties) — the exact batch shape of a real RMS sweep."""
    for pdf in batches:
        rows = {"doc_id": pdf["doc_id"], "n_windows": [], "total_energy": [], "peak_window": []}
        for b in pdf["payload"]:
            buf = bytes(b)
            energies = [
                sum(x * x for x in buf[i : i + AUDIO_WINDOW])
                for i in range(0, len(buf), AUDIO_WINDOW)
            ]
            rows["n_windows"].append(len(energies))
            rows["total_energy"].append(sum(energies) if energies else None)
            rows["peak_window"].append(
                energies.index(max(energies)) + 1 if energies else None
            )
        yield pd.DataFrame(
            {
                "doc_id": rows["doc_id"],
                "n_windows": pd.Series(rows["n_windows"], dtype="int64"),
                "total_energy": pd.Series(rows["total_energy"], dtype="Int64"),
                "peak_window": pd.Series(rows["peak_window"], dtype="Int32"),
            }
        )


@query(
    "q_multimodal_audio",
    oracle=f"""
WITH e AS (
  SELECT doc_id,
         [list_sum([ascii(substring(text, j, 1)) * ascii(substring(text, j, 1))
                    for j in generate_series((w - 1) * {AUDIO_WINDOW} + 1,
                                             LEAST(w * {AUDIO_WINDOW}, LENGTH(text)))])
          for w in generate_series(1, (LENGTH(text) + {AUDIO_WINDOW - 1}) // {AUDIO_WINDOW})]
           AS energies
  FROM documents
)
SELECT doc_id,
       CAST(len(energies) AS BIGINT) AS n_windows,
       CAST(list_sum(energies) AS BIGINT) AS total_energy,
       CAST(list_position(energies, list_max(energies)) AS INT) AS peak_window
FROM e ORDER BY doc_id
""",
    group="llm-multimodal",
)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped mapInPandas stage: payload bytes as 8-bit samples,
    {AUDIO_WINDOW}-sample windowed energy sweep with a peak-window argmax.
    Real audio decode (decode_audio) is stubbed; the window/argmax batch
    shape, Arrow transfer, and nullable outputs for empty payloads are
    the production plumbing, oracle-checked against the ASCII bytes."""
    prepare(spark)
    d = load_table(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(fake_audio_energy, AUDIO_SCHEMA)  # row-level output
