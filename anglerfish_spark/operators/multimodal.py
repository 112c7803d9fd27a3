"""Multimodal columns: opaque binary payloads + typed metadata, with
feature extraction as Arrow-batched ``mapInPandas``.

The pattern for image/audio/video at 100 TB: store the payload as a
``binary`` column (or a reference into object storage) next to typed
metadata; run decode/resize/frame-sample as ``mapInPandas`` stages so bytes
move through Arrow record batches, never row-at-a-time Python.  Partitioning
guidance: payload tables should be partitioned by size-balanced keys
(payload bytes dominate task skew, not row counts).

Decode status (r13): WAV/PCM, G.711 companded WAV (mu-law/A-law),
PNG of EVERY spec color type (grayscale, gray+alpha, truecolor,
palette, RGBA), and baseline grayscale JPEG are REAL, stdlib-only
decodes (:func:`decode_wav` — wave/struct; :func:`decode_wav_companded`
— manual RIFF walk + ITU-T G.711 expansion; :func:`decode_png_any` —
chunk walk + CRC32 verify + zlib IDAT inflate + bpp-aware scanline
unfilter + PLTE expansion; ``operators/jpeg.py`` — Huffman entropy
decode + dequant + IDCT), each oracle-checked end-to-end on synthesized
spec-valid payloads.  Codecs that genuinely need third-party libs
(progressive/chroma JPEG, 16-bit/interlaced PNG, MP3/AAC/FLAC
audio) stay stubbed behind ``NotImplementedError``, with
:func:`fake_features`-style deterministic stand-ins keeping the
Spark-side plumbing (schema, batching, UDF signature) real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import lru_cache

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
    """Decode an image payload to ``(width, height, color_type, rows)``
    of per-pixel channel tuples.  PNG of every spec color type is REAL
    (stdlib :func:`decode_png_any` — zlib inflate + bpp-aware scanline
    unfilter + PLTE expansion); codecs with non-deflate entropy coding
    (JPEG) need external libs absent from this environment and stay
    stubbed."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        out = decode_png_any(payload)
        if out is not None:
            return out
        raise ValueError("malformed PNG payload")
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg_gray

        dec = decode_jpeg_gray(payload)
        if dec is not None:
            w, h, rows = dec
            return w, h, 0, [[(v,) for v in row] for row in rows]
        raise ValueError("malformed or non-baseline JPEG payload")
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        g = decode_gif(payload)
        if g is not None:
            w, h, _, rows = g
            return w, h, 2, rows  # palette expanded to truecolor
        raise ValueError("malformed GIF payload")
    raise NotImplementedError(
        "non-PNG/JPEG/GIF image decode requires imaging libs"
    )


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


def decode_wav(payload: bytes) -> "tuple[int, list[int]] | None":
    """:func:`decode_wav_np` with the samples as a plain list (the
    public contract; aggregating consumers take the array form)."""
    r = decode_wav_np(payload)
    if r is None:
        return None
    sr, arr = r
    return sr, arr.tolist()


def decode_wav_np(payload: bytes):
    """REAL audio decode for RIFF/WAVE PCM — stdlib only (``wave``;
    VERDICT r11 #8): returns ``(sample_rate, samples: np.ndarray[int64])``
    with 16-bit samples read little-endian (8-bit PCM recentered from
    its unsigned storage) and multi-channel payloads reduced to channel
    0.  The array keeps the narrow int16 dtype — consumers doing wide
    arithmetic must widen (``astype(int64)``) themselves.  Malformed/
    truncated/unsupported payloads return ``None`` — decode NEVER
    raises, because its callers route corrupt files to nulls."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            sr = w.getframerate()
            width = w.getsampwidth()
            ch = w.getnchannels()
            raw = w.readframes(w.getnframes())
        if width == 2:
            samples = np.frombuffer(raw, dtype="<i2")
        elif width == 1:  # 8-bit PCM is stored unsigned
            samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128
        else:
            return None
        if ch > 1:
            samples = samples[::ch]
        return sr, samples
    except Exception:  # noqa: BLE001 - any parse failure routes to None
        return None


def decode_audio(payload: bytes):
    """Decode an audio payload to ``(sample_rate, samples)``.  WAV/PCM is
    REAL (stdlib :func:`decode_wav`), as is G.711 companded WAV
    (:func:`decode_wav_companded` — mu-law/A-law expansion); codecs with
    real entropy coding (MP3, AAC, FLAC) need external libs absent from
    this environment and stay stubbed."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        out = decode_wav(payload)
        if out is not None:
            return out
        companded = decode_wav_companded(payload)
        if companded is not None:
            return companded[1], companded[2]
        raise ValueError("malformed WAV payload")
    raise NotImplementedError("non-WAV audio decode requires audio libs")


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

#: below this sample count the per-sample Python energy sweep beats the
#: numpy one (r13-opt: the vectorized path carries ~25 us of fixed array
#: setup; measured crossover ~350 samples — 10.9 vs 33.6 us/doc on the
#: 8-48-sample bench corpus, 5955 vs 494 us/doc at 64k samples).  Both
#: branches are pinned value-identical by
#: tests/test_multimodal.py::TestWavEnergyVectorizedR13Opt.
_WAV_VEC_MIN_SAMPLES = 256

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


# ---------------------------------------------------------------------------
# REAL container-header sniffing (r10): the decode libs stay absent, but
# format detection + dimensions/sample-rate come straight out of the
# binary headers — pure Python over Arrow batches, the corrupt-file /
# wrong-extension filter every multimodal ingest runs before decode
# ---------------------------------------------------------------------------

SNIFF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("sample_rate", T.LongType(), True),
    ]
)


def sniff_container(payload: bytes) -> tuple[str, int | None, int | None, int | None]:
    """Identify a media container and pull its geometry from the HEADER
    bytes alone — no decode, no external libs:

    * PNG — 8-byte signature, then the IHDR chunk carries width/height
      as big-endian uint32 at offsets 16/20 (PNG spec 11.2.2).
    * JPEG — walk the marker stream to the first SOF0/SOF2 frame header;
      height/width are big-endian uint16 at offsets +5/+7 in the segment
      (ITU T.81 B.2.2).
    * GIF — 'GIF87a'/'GIF89a', then the logical screen descriptor's
      width/height as little-endian uint16 at offsets 6/8.
    * WAV — 'RIFF'....'WAVE' with an 'fmt ' chunk: sample rate is the
      little-endian uint32 at offset 24 of the canonical layout.

    Anything else — truncated headers included — is ``('unknown', None,
    None, None)``: sniffing NEVER raises, because its whole job is to
    route malformed payloads out of the decode stage."""
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
            w = int.from_bytes(payload[16:20], "big")
            h = int.from_bytes(payload[20:24], "big")
            return "png", w, h, None
        if payload[:2] == b"\xff\xd8":
            i = 2
            while i + 4 <= len(payload) and payload[i] == 0xFF:
                marker, seglen = payload[i + 1], int.from_bytes(payload[i + 2 : i + 4], "big")
                if marker in (0xC0, 0xC1, 0xC2, 0xC3) and i + 9 <= len(payload):
                    h = int.from_bytes(payload[i + 5 : i + 7], "big")
                    w = int.from_bytes(payload[i + 7 : i + 9], "big")
                    return "jpeg", w, h, None
                if seglen < 2:
                    break  # malformed segment length: stop walking
                i += 2 + seglen
            return "unknown", None, None, None
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w = int.from_bytes(payload[6:8], "little")
            h = int.from_bytes(payload[8:10], "little")
            return "gif", w, h, None
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE" and len(payload) >= 28:
            sr = int.from_bytes(payload[24:28], "little")
            return "wav", None, None, sr
    except (IndexError, ValueError):  # pragma: no cover - defensive
        pass
    return "unknown", None, None, None


def sniff_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        sniffed = [sniff_container(b) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "fmt": [s[0] for s in sniffed],
                "width": pd.array([s[1] for s in sniffed], dtype="Int64"),
                "height": pd.array([s[2] for s in sniffed], dtype="Int64"),
                "sample_rate": pd.array([s[3] for s in sniffed], dtype="Int64"),
            }
        )


def sniff_media(df: DataFrame) -> DataFrame:
    """``(doc_id, payload binary)`` → ``(doc_id, fmt, width, height,
    sample_rate)`` via header sniffing, Arrow-batched."""
    return df.mapInPandas(sniff_batches, SNIFF_SCHEMA)


def _mk_png(w: int, h: int, body: bytes) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + b"\x08\x06\x00\x00\x00" + b"\x00\x00\x00\x00"  # bit depth..fake crc
        + body
    )


def _mk_jpeg(w: int, h: int, body: bytes) -> bytes:
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big") + b"\x03" + bytes(9)
    )
    return b"\xff\xd8" + app0 + sof0 + body


def _mk_gif(w: int, h: int, body: bytes) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + body


def _mk_wav(sr: int, body: bytes) -> bytes:
    return (
        b"RIFF" + (36 + len(body)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + sr.to_bytes(4, "little") + bytes(8)
        + b"data" + len(body).to_bytes(4, "little") + body
    )


def synth_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic media corpus: each document becomes a VALID container
    of a doc_id-chosen format with doc_id-derived geometry (the oracle
    recomputes the same arithmetic); every 17th payload is truncated to
    3 bytes — the corrupt file the sniffer must route to 'unknown'."""
    for pdf in batches:
        out = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            body = text.encode()[:64]
            w, h, sr = doc_id % 640 + 1, doc_id % 480 + 1, 8000 + doc_id % 48000
            kind = doc_id % 4
            if kind == 0:
                p = _mk_png(w, h, body)
            elif kind == 1:
                p = _mk_jpeg(w, h, body)
            elif kind == 2:
                p = _mk_gif(w % 65536, h % 65536, body)
            else:
                p = _mk_wav(sr, body)
            if doc_id % 17 == 0:
                p = p[:3]
            out.append(p)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})


@query(
    "q_multimodal_sniff",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 17 = 0 THEN 'unknown'
            WHEN doc_id % 4 = 0 THEN 'png'
            WHEN doc_id % 4 = 1 THEN 'jpeg'
            WHEN doc_id % 4 = 2 THEN 'gif'
            ELSE 'wav' END AS fmt,
       CASE WHEN doc_id % 17 = 0 OR doc_id % 4 = 3 THEN NULL
            ELSE CAST(doc_id % 640 + 1 AS BIGINT) END AS width,
       CASE WHEN doc_id % 17 = 0 OR doc_id % 4 = 3 THEN NULL
            ELSE CAST(doc_id % 480 + 1 AS BIGINT) END AS height,
       CASE WHEN doc_id % 17 = 0 OR doc_id % 4 <> 3 THEN NULL
            ELSE CAST(8000 + doc_id % 48000 AS BIGINT) END AS sample_rate
FROM documents
ORDER BY doc_id
""",
    group="llm-multimodal",
)
def q_multimodal_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media-container sniffing end-to-end (no decode libs needed):
    documents become valid PNG/JPEG/GIF/WAV payloads with doc_id-derived
    geometry, every 17th truncated to 3 bytes; the engine must detect
    each format and parse width/height/sample-rate OUT OF THE HEADER
    BYTES (big-endian PNG/JPEG vs little-endian GIF/WAV, JPEG behind a
    marker walk past APP0), routing the corrupt payloads to
    ``('unknown', NULL, ...)`` without raising.  The oracle recomputes
    the synthesis arithmetic — a sniffer that misreads endianness, walks
    JPEG markers wrong, or crashes on truncation fails the hash.  Scale
    shape: one map-only mapInPandas pass, bytes stay in Arrow batches."""
    prepare(spark)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = d.mapInPandas(
        synth_payloads,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        ),
    )
    return sniff_media(payloads).orderBy("doc_id")


# ---------------------------------------------------------------------------
# REAL WAV decode end-to-end (r12, VERDICT r11 #8): synthesize valid
# 16-bit PCM RIFF payloads, parse them back with stdlib wave/struct, and
# run the windowed-energy sweep on the DECODED samples — no audio libs
# ---------------------------------------------------------------------------

WAV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("n_windows", T.LongType(), True),
        T.StructField("total_energy", T.LongType(), True),
        T.StructField("peak_window", T.IntegerType(), True),
    ]
)


def _wav_samples(doc_id: int) -> list[int]:
    """The synthesis arithmetic both engines compute: doc_id % 40 + 8
    sixteen-bit samples, sample j = (doc_id·31 + j·7) % 2001 − 1000."""
    n = doc_id % 40 + 8
    return [(doc_id * 31 + j * 7) % 2001 - 1000 for j in range(n)]


def _mk_pcm_wav(sr: int, samples: list[int]) -> bytes:
    """A canonical-layout 16-bit mono PCM WAV: the header every RIFF
    reader (including stdlib ``wave``) accepts."""
    import struct

    body = struct.pack(f"<{len(samples)}h", *samples)
    return (
        b"RIFF" + (36 + len(body)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")   # PCM, mono
        + sr.to_bytes(4, "little") + (sr * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")  # block, bits
        + b"data" + len(body).to_bytes(4, "little") + body
    )


def synth_wav_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic PCM corpus: each document becomes a VALID 16-bit
    mono WAV with doc_id-derived sample rate and samples; every 17th
    payload is truncated to 5 bytes — the corrupt file decode must route
    to nulls, never raise."""
    for pdf in batches:
        out = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            p = _mk_pcm_wav(8000 + d % 8000, _wav_samples(d))
            if d % 17 == 0:
                p = p[:5]
            out.append(p)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})


def wav_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decode + analysis: stdlib-wave-parse each payload, then the
    {AUDIO_WINDOW}-sample windowed sum-of-squares energy sweep over the
    DECODED int16 samples (peak = first argmax); undecodable payloads
    yield null analysis columns.  Decode and sweep are numpy end-to-end
    (r13-opt, guide §4.2): squares, a zero-padded reshape for the
    window sums, ``argmax`` for the first peak — int64-exact, pinned
    against the per-sample Python path in
    tests/test_multimodal.py::TestWavEnergyVectorizedR13Opt."""
    import numpy as np

    for pdf in batches:
        rows: dict[str, list] = {
            "sample_rate": [], "n_samples": [], "n_windows": [],
            "total_energy": [], "peak_window": [],
        }
        for b in pdf["payload"]:
            dec = decode_wav_np(bytes(b))
            if dec is None:
                for k in rows:
                    rows[k].append(None)
                continue
            sr, samples = dec
            n = int(samples.size)
            nw = -(-n // AUDIO_WINDOW)
            if n > _WAV_VEC_MIN_SAMPLES:
                wide = samples.astype(np.int64)  # int16 squares overflow
                sq = wide * wide
                e = np.pad(sq, (0, nw * AUDIO_WINDOW - n)).reshape(
                    nw, AUDIO_WINDOW
                ).sum(axis=1)
                total = int(e.sum()) if nw else None
                peak = int(e.argmax()) + 1 if nw else None
            else:  # tiny frame: numpy's fixed cost exceeds the work
                s = samples.tolist()
                es = [
                    sum(x * x for x in s[i : i + AUDIO_WINDOW])
                    for i in range(0, n, AUDIO_WINDOW)
                ]
                total = sum(es) if es else None
                peak = es.index(max(es)) + 1 if es else None
            rows["sample_rate"].append(sr)
            rows["n_samples"].append(n)
            rows["n_windows"].append(nw)
            rows["total_energy"].append(total)
            rows["peak_window"].append(peak)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "sample_rate": pd.Series(rows["sample_rate"], dtype="Int64"),
                "n_samples": pd.Series(rows["n_samples"], dtype="Int64"),
                "n_windows": pd.Series(rows["n_windows"], dtype="Int64"),
                "total_energy": pd.Series(rows["total_energy"], dtype="Int64"),
                "peak_window": pd.Series(rows["peak_window"], dtype="Int32"),
            }
        )


@query(
    "q_multimodal_wav_decode",
    oracle=f"""
WITH p AS (
  SELECT doc_id, doc_id % 40 + 8 AS n, 8000 + doc_id % 8000 AS sr FROM documents
),
e AS (
  SELECT doc_id, n, sr,
         [list_sum([((doc_id * 31 + j * 7) % 2001 - 1000)
                    * ((doc_id * 31 + j * 7) % 2001 - 1000)
                    for j in generate_series((w - 1) * {AUDIO_WINDOW},
                                             LEAST(w * {AUDIO_WINDOW}, n) - 1)])
          for w in generate_series(1, (n + {AUDIO_WINDOW - 1}) // {AUDIO_WINDOW})]
           AS energies
  FROM p
)
SELECT doc_id,
       CASE WHEN doc_id % 17 = 0 THEN NULL ELSE CAST(sr AS BIGINT) END AS sample_rate,
       CASE WHEN doc_id % 17 = 0 THEN NULL ELSE CAST(n AS BIGINT) END AS n_samples,
       CASE WHEN doc_id % 17 = 0 THEN NULL
            ELSE CAST(len(energies) AS BIGINT) END AS n_windows,
       CASE WHEN doc_id % 17 = 0 THEN NULL
            ELSE CAST(list_sum(energies) AS BIGINT) END AS total_energy,
       CASE WHEN doc_id % 17 = 0 THEN NULL
            ELSE CAST(list_position(energies, list_max(energies)) AS INT) END
         AS peak_window
FROM e ORDER BY doc_id
""",
    group="llm-multimodal",
)
def q_multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end with no third-party libs (VERDICT r11
    #8): every document becomes a VALID 16-bit mono PCM RIFF payload
    (doc_id-derived sample rate + samples, every 17th truncated to 5
    bytes), and the engine must wave/struct-PARSE the bytes back —
    header walk, little-endian int16 unpack — then run the
    {AUDIO_WINDOW}-sample windowed energy sweep on the DECODED samples.
    The oracle recomputes the synthesis arithmetic, so a decoder that
    misreads the fmt chunk, byte order, or sample width fails the hash;
    corrupt payloads must come back as null analysis rows, never errors.
    Scale shape: two map-only Arrow ``mapInPandas`` stages (synth →
    decode+analyze), bytes never leave Arrow batches, no shuffle."""
    prepare(spark)
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = d.mapInPandas(
        synth_wav_payloads,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        ),
    )
    return payloads.mapInPandas(wav_energy, WAV_SCHEMA).orderBy("doc_id")


# ---------------------------------------------------------------------------
# REAL PNG decode end-to-end (r12): stdlib zlib is enough for a genuine
# pixel decode of grayscale PNGs — chunk walk with CRC32 verification,
# IDAT inflation, and per-row scanline UNFILTERING (all five filter
# types) — the other half of the "decode needs third-party libs" stub
# ---------------------------------------------------------------------------


# channels per pixel in the filtered scanline, by IHDR color type:
# 0 grayscale, 2 truecolor, 3 palette INDICES, 4 gray+alpha,
# 6 truecolor+alpha (PNG spec 11.2.2); bytes-per-pixel = channels x
# (bit_depth / 8)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 interlace pass geometry: (x_start, y_start, x_step, y_step)
# per PNG spec 8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, off: int, pw: int, ph: int, bpp: int):
    """Unfilter ``ph`` scanlines of ``pw * bpp`` bytes starting at
    ``raw[off]`` (one image pass: the filter's left/up-left neighbors sit
    ``bpp`` bytes back, the up neighbor is the previous scanline OF THE
    SAME PASS, zero above the first).  Raises on truncation or an
    unknown filter byte; returns ((ph, pw*bpp) uint8 array, new offset).

    r13-opt: filters vectorize per scanline where the recurrence allows
    — None copies, Up is one wrapping uint8 add, Sub is a per-residue
    running sum (``cumsum`` regroups the same mod-256 addends); Average
    and Paeth carry an intra-row data dependence through the
    reconstructed LEFT neighbor and keep the per-byte loop.  Error
    behavior is unchanged: the per-byte form only validated the filter
    byte inside the byte loop, so zero-width scanlines accept ANY
    filter byte — preserved (and pinned by test)."""
    import numpy as np

    stride = pw * bpp
    out = np.empty((ph, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    n = len(raw)
    for r in range(ph):
        if off + stride + 1 > n:
            raise ValueError("short pass data")
        ft = raw[off]
        if ft > 4 and stride:
            raise ValueError("unknown filter type")
        scan = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        row = out[r]
        if ft == 0 or not stride:
            row[:] = scan
        elif ft == 1:  # Sub: per-residue prefix sum (mod-256 addition)
            for k in range(bpp):
                row[k::bpp] = np.cumsum(scan[k::bpp], dtype=np.int64) & 0xFF
        elif ft == 2:  # Up: uint8 add wraps mod 256
            np.add(scan, prev, out=row)
        elif ft == 3:  # Average: loop-carried via the left neighbor
            # r14-opt: head/tail split (the first bpp bytes have a = 0,
            # so they reduce to s + p//2) + a trailing iterator over the
            # output list that stays exactly bpp elements behind the
            # append — no per-byte index arithmetic or conditionals.
            # Exact by construction (same mod-256 floor recurrence); an
            # iterate-to-fixpoint numpy formulation was measured and
            # REJECTED: the floor recurrence admits parity 2-cycles
            # (persistent +/-1 error), so it neither converges reliably
            # nor beats this loop.
            sl = scan.tolist()
            pv = prev.tolist()
            o: list[int] = []
            ap = o.append
            for sc, pc in zip(sl[:bpp], pv[:bpp]):
                ap((sc + (pc >> 1)) & 0xFF)
            a_it = iter(o)
            for sc, pc in zip(sl[bpp:], pv[bpp:]):
                ap((sc + ((next(a_it) + pc) >> 1)) & 0xFF)
            row[:] = o
        else:  # Paeth predictor (PNG spec 9.4): loop-carried likewise
            # r14-opt, same shape.  Head proof (c < bpp, a = cc = 0):
            # p = b, pa = |b|, pb = 0, pc = |b|; b > 0 picks pb's branch
            # -> pred = b, b == 0 picks a = 0 == b -> pred == b always.
            sl = scan.tolist()
            pv = prev.tolist()
            o = []
            ap = o.append
            for sc, b in zip(sl[:bpp], pv[:bpp]):
                ap((sc + b) & 0xFF)
            a_it = iter(o)
            for sc, b, cc in zip(sl[bpp:], pv[bpp:], pv):
                a = next(a_it)
                p = a + b - cc
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - cc if p >= cc else cc - p
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                ap((sc + pred) & 0xFF)
            row[:] = o
        prev = row
        off += stride + 1
    return out, off


def decode_png_planes(payload: bytes):
    """ARRAY CORE of the PNG decode (r13-opt): the same full format walk
    as :func:`decode_png_any` — chunk lengths + CRC32s verified, IDAT
    segments concatenated and inflated, each scanline un-filtered per
    its filter byte (None/Sub/Up/Average/Paeth, PNG spec 9.2) at BYTE
    granularity with the color type's bytes-per-pixel stride, Adam7
    passes unfiltered independently and deinterlaced (spec 8.2), palette
    indices expanded through the PLTE — but returning the pixels as ONE
    numpy array of shape ``(height, width, channels)``: dtype uint8, or
    uint16 for 16-bit samples (big-endian per spec); palette images come
    back EXPANDED with ``color_type`` still 3.  Returns
    ``(width, height, color_type, arr)``; anything malformed — bad
    signature, CRC mismatch, truncation, sub-byte depths, 16-bit
    palette, palette image without/with-bad PLTE, index beyond the
    palette — returns ``None``; decode never raises."""
    import zlib

    import numpy as np

    try:
        if payload[:8] != b"\x89PNG\r\n\x1a\n":
            return None
        i, w, h, ct, idat, plte = 8, None, None, None, b"", None
        depth, interlace = 8, 0
        while i + 8 <= len(payload):
            ln = int.from_bytes(payload[i : i + 4], "big")
            typ = payload[i + 4 : i + 8]
            data = payload[i + 8 : i + 8 + ln]
            if len(data) != ln or i + 12 + ln > len(payload):
                return None  # truncated chunk
            crc = int.from_bytes(payload[i + 8 + ln : i + 12 + ln], "big")
            if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                return None  # corrupt chunk
            if typ == b"IHDR":
                w = int.from_bytes(data[0:4], "big")
                h = int.from_bytes(data[4:8], "big")
                depth, ct, interlace = data[8], data[9], data[12]
                if (
                    depth not in (8, 16)
                    or ct not in _PNG_CHANNELS
                    or interlace not in (0, 1)
                    or (ct == 3 and depth == 16)  # spec: palette depth <= 8
                ):
                    return None
            elif typ == b"PLTE":
                if ln == 0 or ln % 3 or ln > 256 * 3:
                    return None  # spec 11.2.3: 1..256 RGB triples
                plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
            elif typ == b"IDAT":
                idat += data
            elif typ == b"IEND":
                break
            i += 12 + ln
        if w is None or not idat or (ct == 3 and plte is None):
            return None
        nch = _PNG_CHANNELS[ct]
        sb = depth // 8
        bpp = nch * sb
        raw = zlib.decompress(idat)

        def pass_pixels(flat, pw, ph):
            # (ph, pw*bpp) unfiltered bytes -> (ph, pw, channels) samples
            if ct == 3:
                if flat.size and int(flat.max()) >= len(plte):
                    raise ValueError("index beyond palette")
                return plte[flat.reshape(-1)].reshape(ph, pw, 3)
            if sb == 1:
                return flat.reshape(ph, pw, nch)
            a = flat.reshape(ph, pw, nch, 2).astype(np.uint16)
            return (a[..., 0] << 8) | a[..., 1]

        if interlace == 1:  # Adam7: seven independently-filtered passes
            plan, total = [], 0
            for x0, y0, dx, dy in _ADAM7:
                pw = (w - x0 + dx - 1) // dx if w > x0 else 0
                ph = (h - y0 + dy - 1) // dy if h > y0 else 0
                if pw and ph:
                    plan.append((x0, y0, dx, dy, pw, ph))
                    total += ph * (1 + pw * bpp)
            if len(raw) != total:
                return None
            out_nch = 3 if ct == 3 else nch
            dt = np.uint8 if (sb == 1 or ct == 3) else np.uint16
            arr = np.zeros((h, w, out_nch), dtype=dt)
            off = 0
            for x0, y0, dx, dy, pw, ph in plan:
                prows, off = _png_unfilter(raw, off, pw, ph, bpp)
                # the seven passes tile every pixel exactly once
                arr[y0::dy, x0::dx] = pass_pixels(prows, pw, ph)
        else:
            if len(raw) != h * (w * bpp + 1):
                return None
            prows, _ = _png_unfilter(raw, 0, w, h, bpp)
            arr = pass_pixels(prows, w, h)
        return w, h, ct, arr
    except Exception:  # noqa: BLE001 - any parse failure routes to None
        return None


def decode_png_any(
    payload: bytes,
) -> "tuple[int, int, int, list[list[tuple[int, ...]]]] | None":
    """REAL image decode for 8/16-bit PNG of ANY spec color type,
    sequential or Adam7-interlaced — stdlib only (``zlib``): returns
    ``(width, height, color_type, rows)`` where each row is a list of
    per-pixel channel tuples — grayscale ``(g,)``, gray+alpha
    ``(g, a)``, truecolor ``(r, g, b)`` (palette images expanded through
    their PLTE), RGBA ``(r, g, b, a)``; 16-bit samples are big-endian
    per spec.  Since r13-opt this is the tuple VIEW over
    :func:`decode_png_planes` (which performs the full format walk);
    aggregating consumers should take the array form directly.
    Anything malformed returns ``None``; decode never raises."""
    dec = decode_png_planes(payload)
    if dec is None:
        return None
    w, h, ct, arr = dec
    return w, h, ct, [list(map(tuple, r)) for r in arr.tolist()]


def decode_png(payload: bytes) -> "tuple[int, int, list[list[int]]] | None":
    """REAL image decode for 8-bit GRAYSCALE PNG — the single-channel
    view over :func:`decode_png_planes` (the same full format walk:
    CRC32 verify, IDAT inflate, bpp-aware scanline unfilter); returns
    ``(width, height, rows)`` of pixel values, ``None`` for anything
    malformed OR any non-grayscale color type."""
    dec = decode_png_planes(payload)
    if dec is None or dec[2] != 0:
        return None
    w, h, _, arr = dec
    return w, h, arr[:, :, 0].tolist()


def _png_pixel(doc_id: int, r: int, c: int) -> int:
    """The synthesis arithmetic both engines compute."""
    return (doc_id * 7 + r * 13 + c * 3) % 256


def _mk_real_png(doc_id: int, w: int, h: int) -> bytes:
    """A spec-valid 8-bit grayscale PNG whose rows are DELIBERATELY
    filtered (row % 5 → None/Sub/Up/Average/Paeth — VERDICT r12 #5:
    ALL five spec filter types, so the decoder's Average and Paeth
    unfiltering are exercised, not dead code), so only a decoder that
    really reverses the filters recovers the pixels."""
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + typ + data
            + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, 0, 0, 0, 0])  # 8-bit, grayscale, deflate, none, none
    )
    raw = bytearray()
    prev = [0] * w
    for r in range(h):
        px = [_png_pixel(doc_id, r, c) for c in range(w)]
        ft = r % 5
        raw.append(ft)
        for c in range(w):
            left = px[c - 1] if c else 0
            up = prev[c]
            ul = prev[c - 1] if c else 0
            if ft == 0:
                raw.append(px[c])
            elif ft == 1:
                raw.append((px[c] - left) & 0xFF)
            elif ft == 2:
                raw.append((px[c] - up) & 0xFF)
            elif ft == 3:
                raw.append((px[c] - (left + up) // 2) & 0xFF)
            else:
                raw.append((px[c] - paeth(left, up, ul)) & 0xFF)
        prev = px
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


PNG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("first_pixel", T.IntegerType(), True),
        T.StructField("last_pixel", T.IntegerType(), True),
    ]
)


def synth_png_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic PNG corpus: doc_id-derived geometry + pixels, rows
    deliberately filter-encoded; every 17th payload gets one IDAT byte
    flipped — a CRC-valid header with CORRUPT content would decode to
    wrong pixels, so the flip also breaks the CRC and must route to
    nulls."""
    for pdf in batches:
        out = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            p = _mk_real_png(d, d % 12 + 2, d % 9 + 2)
            if d % 17 == 0:
                i = len(p) // 2
                p = p[:i] + bytes([p[i] ^ 0xFF]) + p[i + 1 :]
            out.append(p)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})


def png_pixels(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decode + pixel statistics over Arrow batches; undecodable
    payloads yield null analysis columns.  r13-opt: consumes the
    :func:`decode_png_planes` array core — the moments are numpy int64
    sums over the plane (exact), not a Python reduce over tuples."""
    import numpy as np

    for pdf in batches:
        rows: dict[str, list] = {
            "width": [], "height": [], "pixel_sum": [],
            "first_pixel": [], "last_pixel": [],
        }
        for b in pdf["payload"]:
            dec = decode_png_planes(bytes(b))
            if dec is None or dec[2] != 0:  # grayscale sweep only
                for k in rows:
                    rows[k].append(None)
                continue
            w, h, _, arr = dec
            plane = arr[:, :, 0]
            rows["width"].append(w)
            rows["height"].append(h)
            rows["pixel_sum"].append(int(plane.sum(dtype=np.int64)))
            rows["first_pixel"].append(int(plane[0, 0]))
            rows["last_pixel"].append(int(plane[-1, -1]))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pd.Series(rows["width"], dtype="Int64"),
                "height": pd.Series(rows["height"], dtype="Int64"),
                "pixel_sum": pd.Series(rows["pixel_sum"], dtype="Int64"),
                "first_pixel": pd.Series(rows["first_pixel"], dtype="Int32"),
                "last_pixel": pd.Series(rows["last_pixel"], dtype="Int32"),
            }
        )


@query(
    "q_multimodal_png_decode",
    oracle="""
WITH g AS (
  SELECT doc_id, doc_id % 12 + 2 AS w, doc_id % 9 + 2 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h,
         list_sum([(doc_id * 7 + (i // w) * 13 + (i % w) * 3) % 256
                   for i in generate_series(0, w * h - 1)]) AS psum
  FROM g
)
SELECT doc_id,
       CASE WHEN doc_id % 17 = 0 THEN NULL ELSE CAST(w AS BIGINT) END AS width,
       CASE WHEN doc_id % 17 = 0 THEN NULL ELSE CAST(h AS BIGINT) END AS height,
       CASE WHEN doc_id % 17 = 0 THEN NULL ELSE CAST(psum AS BIGINT) END AS pixel_sum,
       CASE WHEN doc_id % 17 = 0 THEN NULL
            ELSE CAST(doc_id * 7 % 256 AS INT) END AS first_pixel,
       CASE WHEN doc_id % 17 = 0 THEN NULL
            ELSE CAST((doc_id * 7 + (h - 1) * 13 + (w - 1) * 3) % 256 AS INT) END
         AS last_pixel
FROM px ORDER BY doc_id
""",
    group="llm-multimodal",
)
def q_multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end with no imaging libs (r12): every
    document becomes a spec-valid 8-bit grayscale PNG — doc_id-derived
    geometry and pixels, scanlines DELIBERATELY filter-encoded
    (row % 5: all five spec filter types) — and the engine must walk the chunks, verify
    CRC32s, inflate IDAT with zlib, and UNFILTER each scanline to
    recover the pixels.  The oracle recomputes the pixel arithmetic, so
    a decoder that skips unfiltering (or misorders rows) fails the
    hash; every 17th payload has a flipped IDAT byte whose broken CRC
    must route the row to nulls, never an error.  Scale shape: two
    map-only Arrow ``mapInPandas`` stages, no shuffle."""
    prepare(spark)
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = d.mapInPandas(
        synth_png_payloads,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        ),
    )
    return payloads.mapInPandas(png_pixels, PNG_SCHEMA).orderBy("doc_id")

# ---------------------------------------------------------------------------
# REAL COLOR PNG decode end-to-end (r13): truecolor RGB, palette, and
# RGBA payloads through the same stdlib decoder — the "color PNG needs
# third-party libs" stub is gone; only codecs with non-deflate entropy
# coding (JPEG) remain env-gated
# ---------------------------------------------------------------------------


def _png_color_type(doc_id: int) -> int:
    """Synthesis color type by doc: truecolor / palette / RGBA."""
    return (2, 3, 6)[doc_id % 3]


def _png_channel(doc_id: int, r: int, c: int, ch: int) -> int:
    """The per-channel synthesis arithmetic both engines compute (for
    palette images this is the INDEX at ch=0; the palette maps index
    ``i`` to ``(i*5 % 256, i*11 % 256, i*17 % 256)``)."""
    return (doc_id * 7 + r * 13 + c * 3 + ch * 31) % 256


def _mk_color_png(doc_id: int, w: int, h: int, interlace: bool = False) -> bytes:
    """A spec-valid 8-bit color PNG (type by ``_png_color_type``) whose
    scanlines are DELIBERATELY filtered (row % 5 → all five spec filter
    types) at the color type's byte stride, so only a decoder that
    reverses the filters with the correct bytes-per-pixel neighbor
    offset recovers the channels.  Palette images carry a full 256-entry
    PLTE.  ``interlace=True`` stores the image as seven Adam7 passes
    (each independently filtered), so the decoder's deinterlacing is
    exercised on the same pixel plane."""
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + typ + data
            + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    def paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    ct = _png_color_type(doc_id)
    bpp = _PNG_CHANNELS[ct]
    nch = 1 if ct == 3 else bpp
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, ct, 0, 0, 1 if interlace else 0])
    )

    def filter_pass(pixel_rows: "list[bytearray]", raw: bytearray) -> None:
        prev = bytearray(len(pixel_rows[0]))
        for r, cur in enumerate(pixel_rows):
            ft = r % 5
            raw.append(ft)
            for i in range(len(cur)):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                if ft == 0:
                    raw.append(cur[i])
                elif ft == 1:
                    raw.append((cur[i] - a) & 0xFF)
                elif ft == 2:
                    raw.append((cur[i] - b) & 0xFF)
                elif ft == 3:
                    raw.append((cur[i] - (a + b) // 2) & 0xFF)
                else:
                    raw.append((cur[i] - paeth(a, b, cc)) & 0xFF)
            prev = cur

    def px_bytes(r: int, c: int) -> "list[int]":
        return [_png_channel(doc_id, r, c, ch) for ch in range(nch)]

    raw = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            if not pw or not ph:
                continue
            filter_pass(
                [
                    bytearray(
                        v
                        for c in range(pw)
                        for v in px_bytes(y0 + r * dy, x0 + c * dx)
                    )
                    for r in range(ph)
                ],
                raw,
            )
    else:
        filter_pass(
            [
                bytearray(v for c in range(w) for v in px_bytes(r, c))
                for r in range(h)
            ],
            raw,
        )
    parts = [b"\x89PNG\r\n\x1a\n", chunk(b"IHDR", ihdr)]
    if ct == 3:
        plte = bytes(
            v for i in range(256) for v in (i * 5 % 256, i * 11 % 256, i * 17 % 256)
        )
        parts.append(chunk(b"PLTE", plte))
    parts.append(chunk(b"IDAT", zlib.compress(bytes(raw))))
    parts.append(chunk(b"IEND", b""))
    return b"".join(parts)


PNG_COLOR_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("color_type", T.IntegerType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
        T.StructField("sum_a", T.LongType(), True),
    ]
)


def synth_color_png_payloads(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic color-PNG corpus: doc_id-derived color type,
    geometry, channels; every 7th payload is stored Adam7-INTERLACED
    (same pixels, so the oracle is unchanged — only a decoder that
    really deinterlaces recovers them); every 19th payload gets one
    byte flipped mid-file (breaking a chunk CRC) and must route to
    nulls."""
    for pdf in batches:
        out = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            p = _mk_color_png(d, d % 10 + 2, d % 7 + 2, interlace=(d % 7 == 3))
            if d % 19 == 0:
                i = len(p) // 2
                p = p[:i] + bytes([p[i] ^ 0xFF]) + p[i + 1 :]
            out.append(p)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})


def png_channel_sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL color decode + per-channel statistics over Arrow batches;
    palette images report their EXPANDED RGB sums, alpha sum only where
    the color type carries alpha; undecodable payloads yield null rows."""
    for pdf in batches:
        cols: dict[str, list] = {
            "color_type": [], "width": [], "height": [],
            "sum_r": [], "sum_g": [], "sum_b": [], "sum_a": [],
        }
        for b in pdf["payload"]:
            dec = decode_png_planes(bytes(b))
            if dec is None or dec[2] not in (2, 3, 6):
                for k in cols:
                    cols[k].append(None)
                continue
            w, h, ct, arr = dec
            # r13-opt: channel sums fold over the plane array in C
            # (int64-exact), not a Python reduce over pixel tuples
            s = arr.sum(axis=(0, 1), dtype="int64")
            cols["color_type"].append(ct)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["sum_r"].append(int(s[0]))
            cols["sum_g"].append(int(s[1]))
            cols["sum_b"].append(int(s[2]))
            cols["sum_a"].append(int(s[3]) if ct == 6 else None)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "color_type": pd.Series(cols["color_type"], dtype="Int32"),
                "width": pd.Series(cols["width"], dtype="Int64"),
                "height": pd.Series(cols["height"], dtype="Int64"),
                "sum_r": pd.Series(cols["sum_r"], dtype="Int64"),
                "sum_g": pd.Series(cols["sum_g"], dtype="Int64"),
                "sum_b": pd.Series(cols["sum_b"], dtype="Int64"),
                "sum_a": pd.Series(cols["sum_a"], dtype="Int64"),
            }
        )


@query(
    "q_multimodal_png_color",
    oracle="""
WITH g AS (
  SELECT doc_id, doc_id % 10 + 2 AS w, doc_id % 7 + 2 AS h,
         CASE doc_id % 3 WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 6 END AS ct
  FROM documents
),
px AS (
  SELECT doc_id, w, h, ct,
    CASE WHEN ct = 3
      THEN list_sum([(((doc_id*7 + (i//w)*13 + (i%w)*3) % 256) * 5) % 256
                     for i in generate_series(0, w*h - 1)])
      ELSE list_sum([(doc_id*7 + (i//w)*13 + (i%w)*3) % 256
                     for i in generate_series(0, w*h - 1)])
    END AS sr,
    CASE WHEN ct = 3
      THEN list_sum([(((doc_id*7 + (i//w)*13 + (i%w)*3) % 256) * 11) % 256
                     for i in generate_series(0, w*h - 1)])
      ELSE list_sum([(doc_id*7 + (i//w)*13 + (i%w)*3 + 31) % 256
                     for i in generate_series(0, w*h - 1)])
    END AS sg,
    CASE WHEN ct = 3
      THEN list_sum([(((doc_id*7 + (i//w)*13 + (i%w)*3) % 256) * 17) % 256
                     for i in generate_series(0, w*h - 1)])
      ELSE list_sum([(doc_id*7 + (i//w)*13 + (i%w)*3 + 62) % 256
                     for i in generate_series(0, w*h - 1)])
    END AS sb,
    CASE WHEN ct = 6
      THEN list_sum([(doc_id*7 + (i//w)*13 + (i%w)*3 + 93) % 256
                     for i in generate_series(0, w*h - 1)])
    END AS sa
  FROM g
)
SELECT doc_id,
  CASE WHEN doc_id % 19 = 0 THEN NULL ELSE CAST(ct AS INT) END AS color_type,
  CASE WHEN doc_id % 19 = 0 THEN NULL ELSE CAST(w AS BIGINT) END AS width,
  CASE WHEN doc_id % 19 = 0 THEN NULL ELSE CAST(h AS BIGINT) END AS height,
  CASE WHEN doc_id % 19 = 0 THEN NULL ELSE CAST(sr AS BIGINT) END AS sum_r,
  CASE WHEN doc_id % 19 = 0 THEN NULL ELSE CAST(sg AS BIGINT) END AS sum_g,
  CASE WHEN doc_id % 19 = 0 THEN NULL ELSE CAST(sb AS BIGINT) END AS sum_b,
  CASE WHEN doc_id % 19 = 0 THEN NULL ELSE CAST(sa AS BIGINT) END AS sum_a
FROM px ORDER BY doc_id
""",
    group="llm-multimodal",
)
def q_multimodal_png_color(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COLOR image decode end-to-end with no imaging libs (r13):
    every document becomes a spec-valid 8-bit PNG whose color type
    cycles truecolor → palette → RGBA by doc_id, scanlines deliberately
    filter-encoded (row % 5, all five spec filters) at the type's byte
    stride — the engine must walk chunks, verify CRC32s, inflate IDAT,
    unfilter with the correct bytes-per-pixel neighbor offset, and for
    palette images expand indices through the PLTE.  The oracle
    recomputes the channel arithmetic, so a decoder that unfilters at
    the wrong stride (the classic color-PNG bug: treating ``a`` as one
    byte left instead of one PIXEL left) or mis-maps the palette fails
    the hash; every 7th payload is stored Adam7-INTERLACED (seven
    independently-filtered passes, spec 8.2) so deinterlacing is
    exercised on the same oracle; every 19th payload has a flipped byte
    whose broken CRC must route the row to nulls, never an error.
    Scale shape: two map-only Arrow ``mapInPandas`` stages, no
    shuffle."""
    prepare(spark)
    # CPU-dense Python sweep (~140 us/doc inflate+unfilter): fanned out
    # for the same reason as the JPEG sweep above
    d = load_table(spark, sf_dir, "documents", fanout=True).select("doc_id")
    payloads = d.mapInPandas(
        synth_color_png_payloads,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        ),
    )
    return payloads.mapInPandas(png_channel_sums, PNG_COLOR_SCHEMA).orderBy("doc_id")

# ---------------------------------------------------------------------------
# REAL baseline JPEG decode end-to-end (r13): the Huffman entropy decode +
# IDCT live in operators/jpeg.py (stdlib only).  Synthesis writes each
# block's DCT coefficients ANALYTICALLY — a constant (DC-only) plus a
# (4,4)-checkerboard harmonic whose IDCT is exactly integral — so the
# pipeline stays bit-deterministic despite JPEG being lossy in general,
# and a SQL oracle can recompute the pixels
# ---------------------------------------------------------------------------

# the (4,4) basis function's sign pattern: cos((2t+1)*pi/4) ~ sigma(t)*sqrt(2)/2
_JPEG_SIGN = (1, -1, -1, 1, 1, -1, -1, 1)
# synthesis Huffman tables (canonical, all 4-bit codes; valid per Annex C)
_JPEG_DC_BITS = [0, 0, 0, 12] + [0] * 12
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 0, 0, 7] + [0] * 12
_JPEG_AC_VALS = [0x00, 0xF0, 0x61, 0x62, 0x63, 0x64, 0x65]


def _jpeg_base(doc_id: int, bx: int, by: int) -> int:
    """Per-block constant (the DC term) both engines compute."""
    return 64 + (doc_id * 7 + by * 13 + bx * 3) % 128


def _jpeg_amp(doc_id: int, bx: int, by: int) -> int:
    """Per-block checkerboard amplitude (the (4,4) AC term)."""
    return (doc_id * 5 + bx * 11 + by * 3) % 25


def _jpeg_pixel(doc_id: int, bx: int, by: int, y: int, x: int) -> int:
    """Decoded pixel at block (bx, by), offset (y, x): base + amp*sign."""
    return _jpeg_base(doc_id, bx, by) + _jpeg_amp(doc_id, bx, by) * (
        _JPEG_SIGN[y] * _JPEG_SIGN[x]
    )


class _JpegBitWriter:
    """MSB-first bit writer with 0xFF byte-stuffing; final byte 1-padded.

    Bits accumulate into one arbitrary-precision int per flush segment
    (restart intervals flush between markers) and materialize in bulk:
    ``to_bytes`` + a single ``replace`` inserts the stuffed 0x00 after
    every 0xFF — byte-identical to the per-bit loop it replaced (the
    stuffed bytes are not part of the bit stream, so stuffing after
    assembly commutes), measured ~6x faster on the synth sweep."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int) -> None:
        if nbits:
            self.acc = (self.acc << nbits) | (val & ((1 << nbits) - 1))
            self.n += nbits

    def flush(self) -> None:
        pad = (-self.n) % 8
        nbytes = (self.n + pad) // 8
        if nbytes:
            raw = ((self.acc << pad) | ((1 << pad) - 1)).to_bytes(nbytes, "big")
            self.out += raw.replace(b"\xff", b"\xff\x00")
        self.acc, self.n = 0, 0


@lru_cache(maxsize=1)
def _jpeg_synth_codes() -> "tuple[dict, dict]":
    """value -> (length, code) encode tables for the synth's FIXED DHT
    pair — built once per process, not once per payload (the tables are
    module constants; per-payload reconstruction was ~20% of synth)."""
    from .jpeg import build_huffman

    dc = {v: k for k, v in build_huffman(_JPEG_DC_BITS, _JPEG_DC_VALS).items()}
    ac = {v: k for k, v in build_huffman(_JPEG_AC_BITS, _JPEG_AC_VALS).items()}
    return dc, ac


def _mk_real_jpeg(doc_id: int, wb: int, hb: int, restart: int = 0) -> bytes:
    """A spec-valid baseline grayscale JPEG of ``wb`` x ``hb`` 8x8 blocks.
    Each block's coefficients are written analytically: quantized DC =
    base - 128 (Q[0] = 8 folds the FDCT's x8), quantized (4,4) = amp
    (Q[zz(4,4)] = 8 likewise), everything else zero — so the entropy
    stream exercises DC differential coding, ZRL runs, EOB, and byte
    stuffing, and the decoder's IDCT reconstructs the pixels EXACTLY.
    ``restart`` > 0 emits a DRI segment and RSTn markers every that many
    MCUs (predictor reset), for the decoder's restart path."""
    from .jpeg import ZZ_POS

    dc_codes, ac_codes = _jpeg_synth_codes()
    k44 = ZZ_POS[4][4]
    q = [16] * 64
    q[0] = 8
    q[k44] = 8

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    w, h = wb * 8, hb * 8
    head = bytearray(b"\xff\xd8")  # SOI
    head += seg(0xDB, bytes([0x00]) + bytes(q))  # DQT, 8-bit table 0
    head += seg(
        0xC0,  # SOF0: precision 8, 1 component, 1x1 sampling, qtable 0
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    head += seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    head += seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    if restart:
        head += seg(0xDD, restart.to_bytes(2, "big"))
    head += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS

    bw = _JpegBitWriter()
    pred, nrst = 0, 0
    for bi in range(wb * hb):
        if restart and bi and bi % restart == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (nrst % 8)])
            nrst += 1
            pred = 0
        by, bx = divmod(bi, wb)
        dc = _jpeg_base(doc_id, bx, by) - 128
        diff, pred = dc - pred, dc
        t = abs(diff).bit_length()
        ln, code = dc_codes[t]
        bw.put(code, ln)
        if t:
            bw.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        amp = _jpeg_amp(doc_id, bx, by)
        if amp:
            run = k44 - 1
            while run >= 16:
                ln, code = ac_codes[0xF0]  # ZRL
                bw.put(code, ln)
                run -= 16
            s = amp.bit_length()
            ln, code = ac_codes[(run << 4) | s]
            bw.put(code, ln)
            bw.put(amp, s)
        if not amp or k44 < 63:
            ln, code = ac_codes[0x00]  # EOB
            bw.put(code, ln)
    bw.flush()
    return bytes(head) + bytes(bw.out) + b"\xff\xd9"  # EOI


JPEG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("pixel_sum", T.LongType(), True),
        T.StructField("pixel_sumsq", T.LongType(), True),
        T.StructField("first_pixel", T.IntegerType(), True),
        T.StructField("second_pixel", T.IntegerType(), True),
    ]
)


def synth_jpeg_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic JPEG corpus: doc_id-derived block grid and
    coefficients; every 23rd payload is truncated to half its bytes —
    the entropy stream (or a header) ends mid-decode and must route to
    nulls, never an error (JPEG has no CRC, so truncation is the
    deterministic corruption)."""
    for pdf in batches:
        out = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            p = _mk_real_jpeg(d, d % 3 + 1, d % 2 + 1)
            if d % 23 == 0:
                p = p[: len(p) // 2]
            out.append(p)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})


def jpeg_pixels(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL baseline JPEG decode + pixel statistics over Arrow batches;
    undecodable payloads yield null analysis columns.  Pixel moments run
    through numpy per image (exact: int64 over 0..255 pixels), not a
    Python reduce over w*h values."""
    import numpy as np

    from .jpeg import decode_jpeg_gray

    for pdf in batches:
        cols: dict[str, list] = {
            "width": [], "height": [], "pixel_sum": [], "pixel_sumsq": [],
            "first_pixel": [], "second_pixel": [],
        }
        for b in pdf["payload"]:
            dec = decode_jpeg_gray(bytes(b))
            if dec is None:
                for k in cols:
                    cols[k].append(None)
                continue
            w, h, px = dec
            arr = np.asarray(px, dtype=np.int64)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["pixel_sum"].append(int(arr.sum()))
            cols["pixel_sumsq"].append(int((arr * arr).sum()))
            cols["first_pixel"].append(px[0][0])
            cols["second_pixel"].append(px[0][1])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pd.Series(cols["width"], dtype="Int64"),
                "height": pd.Series(cols["height"], dtype="Int64"),
                "pixel_sum": pd.Series(cols["pixel_sum"], dtype="Int64"),
                "pixel_sumsq": pd.Series(cols["pixel_sumsq"], dtype="Int64"),
                "first_pixel": pd.Series(cols["first_pixel"], dtype="Int32"),
                "second_pixel": pd.Series(cols["second_pixel"], dtype="Int32"),
            }
        )


@query(
    "q_multimodal_jpeg_decode",
    oracle="""
WITH g AS (
  SELECT doc_id, doc_id % 3 + 1 AS wb, doc_id % 2 + 1 AS hb FROM documents
),
blk AS (
  SELECT doc_id, wb, hb,
    list_sum([64 + (doc_id*7 + (i//wb)*13 + (i%wb)*3) % 128
              for i in generate_series(0, wb*hb - 1)]) AS base_sum,
    list_sum([
        (64 + (doc_id*7 + (i//wb)*13 + (i%wb)*3) % 128)
      * (64 + (doc_id*7 + (i//wb)*13 + (i%wb)*3) % 128)
      + ((doc_id*5 + (i%wb)*11 + (i//wb)*3) % 25)
      * ((doc_id*5 + (i%wb)*11 + (i//wb)*3) % 25)
      for i in generate_series(0, wb*hb - 1)]) AS sq_sum
  FROM g
)
SELECT doc_id,
  CASE WHEN doc_id % 23 = 0 THEN NULL ELSE CAST(wb*8 AS BIGINT) END AS width,
  CASE WHEN doc_id % 23 = 0 THEN NULL ELSE CAST(hb*8 AS BIGINT) END AS height,
  CASE WHEN doc_id % 23 = 0 THEN NULL ELSE CAST(64*base_sum AS BIGINT) END
    AS pixel_sum,
  CASE WHEN doc_id % 23 = 0 THEN NULL ELSE CAST(64*sq_sum AS BIGINT) END
    AS pixel_sumsq,
  CASE WHEN doc_id % 23 = 0 THEN NULL
       ELSE CAST(64 + doc_id*7 % 128 + doc_id*5 % 25 AS INT) END AS first_pixel,
  CASE WHEN doc_id % 23 = 0 THEN NULL
       ELSE CAST(64 + doc_id*7 % 128 - doc_id*5 % 25 AS INT) END AS second_pixel
FROM blk ORDER BY doc_id
""",
    group="llm-multimodal",
)
def q_multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode end-to-end with no imaging libs (r13):
    every document becomes a spec-valid baseline grayscale JPEG
    (doc_id-derived block grid; per-block constant + (4,4)-harmonic
    coefficients chosen so reconstruction is exactly integral) and the
    engine must walk the markers, build canonical Huffman tables from
    DHT, entropy-decode the scan (DC differential, ZRL runs, EOB, byte
    stuffing), dequantize, de-zigzag, and run the 2-D IDCT
    (``operators/jpeg.py``).  The oracle recomputes the block arithmetic:
    pixel_sum pins DC decode, pixel_sumsq pins the AC harmonic (its sum
    cancels, its square doesn't), first/second pixel pin the sign
    pattern.  Every 23rd payload is truncated mid-file and must route to
    nulls.  Scale shape: two map-only Arrow ``mapInPandas`` stages, no
    shuffle."""
    prepare(spark)
    # CPU-dense Python sweep (~170 us/doc entropy decode): fan the
    # doc_id scan out so the two mapInPandas stages use every core —
    # the 594 KB single-row-group parquet otherwise scans as ONE
    # partition and the whole sweep runs serial (guide §2.4 / registry
    # fanout contract; measured 2.8 -> 1.9 s at sf0.1)
    d = load_table(spark, sf_dir, "documents", fanout=True).select("doc_id")
    payloads = d.mapInPandas(
        synth_jpeg_payloads,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        ),
    )
    return payloads.mapInPandas(jpeg_pixels, JPEG_SCHEMA).orderBy("doc_id")

# ---------------------------------------------------------------------------
# REAL compressed-audio decode (r13): G.711 mu-law / A-law companded WAV
# (format tags 7 / 6) — the standard telephony codecs' expansion is
# closed-form integer arithmetic (ITU-T G.711 tables 1a/2a), so the
# decode is stdlib-only AND the oracle can recompute the linear samples
# ---------------------------------------------------------------------------


def ulaw_to_linear(v: int) -> int:
    """G.711 mu-law expansion (the public-domain CCITT g711.c formula):
    complement, then magnitude = ((mantissa*8 + 132) << exponent) - 132,
    sign bit set => negative."""
    u = ~v & 0xFF
    mag = (((u & 0x0F) << 3) + 0x84 << ((u & 0x70) >> 4)) - 0x84
    return -mag if u & 0x80 else mag


def alaw_to_linear(v: int) -> int:
    """G.711 A-law expansion: even-bit inversion (XOR 0x55), segment 0 is
    linear, higher segments shift; sign bit set => POSITIVE (A-law's
    polarity convention is the inverse of mu-law's)."""
    a = v ^ 0x55
    e, m = (a >> 4) & 0x07, a & 0x0F
    t = (m << 4) + 8 if e == 0 else ((m << 4) + 0x108) << (e - 1)
    return t if a & 0x80 else -t


@lru_cache(maxsize=1)
def _g711_luts():
    """The two 256-entry expansion tables as int64 numpy arrays, built
    once per process from the closed-form formulas (r13-opt, guide
    §4.2): G.711 is a pure byte→linear table codec, so the whole
    expansion is one ``lut[np.frombuffer(data)]`` gather instead of a
    Python call per sample."""
    import numpy as np

    return (
        np.array([alaw_to_linear(v) for v in range(256)], dtype=np.int64),
        np.array([ulaw_to_linear(v) for v in range(256)], dtype=np.int64),
    )


def decode_wav_companded(payload: bytes) -> "tuple[str, int, list[int]] | None":
    """:func:`decode_wav_companded_np` with the samples as a plain list
    (the public contract; aggregating consumers take the array form)."""
    r = decode_wav_companded_np(payload)
    if r is None:
        return None
    codec, sr, arr = r
    return codec, sr, arr.tolist()


def decode_wav_companded_np(payload: bytes):
    """REAL compressed-audio decode for G.711 companded RIFF/WAVE —
    manual chunk walk (the stdlib ``wave`` module rejects non-PCM
    formats): parses fmt (tag 6 = A-law, 7 = mu-law, 8-bit samples),
    skips unknown chunks with odd-size padding per RIFF, requires the
    data chunk's declared size to be fully present (truncation =>
    ``None``), expands channel 0 through the G.711 tables.  Returns
    ``(codec, sample_rate, samples: np.ndarray[int64])``; never
    raises."""
    import numpy as np

    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        i, fmt, data = 12, None, None
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            sz = int.from_bytes(payload[i + 4 : i + 8], "little")
            body = payload[i + 8 : i + 8 + sz]
            if cid == b"fmt ":
                if sz < 16:
                    return None
                fmt = (
                    int.from_bytes(body[0:2], "little"),  # tag
                    int.from_bytes(body[2:4], "little"),  # channels
                    int.from_bytes(body[4:8], "little"),  # sample rate
                    int.from_bytes(body[14:16], "little"),  # bits/sample
                )
            elif cid == b"data":
                if len(body) != sz:
                    return None  # truncated data chunk
                data = body
            i += 8 + sz + (sz & 1)  # RIFF pads odd chunks
        if fmt is None or data is None:
            return None
        tag, ch, sr, bits = fmt
        if tag not in (6, 7) or bits != 8 or ch < 1:
            return None
        lut = _g711_luts()[0 if tag == 6 else 1]
        samples = lut[np.frombuffer(data, dtype=np.uint8)[::ch]]
        return ("alaw" if tag == 6 else "ulaw"), sr, samples
    except Exception:  # noqa: BLE001 - any parse failure routes to None
        return None


def _mk_g711_wav(doc_id: int, n: int, tag: int, sr: int = 8000) -> bytes:
    """A spec-valid companded WAV: fmt chunk with cbSize extension (18
    bytes, as non-PCM formats require), a fact chunk with the sample
    count, and ``n`` mono 8-bit samples ``(doc_id*13 + i*7) % 256``."""
    body = bytes((doc_id * 13 + i * 7) % 256 for i in range(n))
    fmt = (
        tag.to_bytes(2, "little") + (1).to_bytes(2, "little")
        + sr.to_bytes(4, "little") + sr.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        + (0).to_bytes(2, "little")
    )

    def chunk(cid: bytes, data: bytes) -> bytes:
        return cid + len(data).to_bytes(4, "little") + data + (b"\0" * (len(data) & 1))

    inner = (
        b"WAVE" + chunk(b"fmt ", fmt)
        + chunk(b"fact", n.to_bytes(4, "little"))
        + chunk(b"data", body)
    )
    return b"RIFF" + len(inner).to_bytes(4, "little") + inner


G711_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("codec", T.StringType(), True),
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("sum_samples", T.LongType(), True),
        T.StructField("sum_abs", T.LongType(), True),
        T.StructField("first_sample", T.IntegerType(), True),
        T.StructField("last_sample", T.IntegerType(), True),
    ]
)


def synth_g711_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic G.711 corpus: codec alternates mu-law / A-law by
    doc, sample bytes doc-derived; every 13th payload loses its tail
    (data chunk declared longer than present) and must route to nulls."""
    for pdf in batches:
        out = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            p = _mk_g711_wav(d, d % 200 + 50, 7 if d % 2 == 0 else 6)
            if d % 13 == 0:
                p = p[:-10]
            out.append(p)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})


def g711_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL companded decode + linear-sample statistics over Arrow
    batches; undecodable payloads yield null analysis columns.  The
    decode and the moments are numpy end-to-end (r13-opt, guide §4.2:
    LUT gather + int64 sums; pinned value-identical to the per-sample
    Python path in tests/test_multimodal.py::TestG711VectorizedR13Opt)."""
    import numpy as np

    for pdf in batches:
        cols: dict[str, list] = {
            "codec": [], "sample_rate": [], "n_samples": [],
            "sum_samples": [], "sum_abs": [], "first_sample": [], "last_sample": [],
        }
        for b in pdf["payload"]:
            dec = decode_wav_companded_np(bytes(b))
            if dec is None or dec[2].size == 0:
                for k in cols:
                    cols[k].append(None)
                continue
            codec, sr, s = dec
            cols["codec"].append(codec)
            cols["sample_rate"].append(sr)
            cols["n_samples"].append(int(s.size))
            cols["sum_samples"].append(int(s.sum()))
            cols["sum_abs"].append(int(np.abs(s).sum()))
            cols["first_sample"].append(int(s[0]))
            cols["last_sample"].append(int(s[-1]))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "codec": pd.Series(cols["codec"], dtype="object"),
                "sample_rate": pd.Series(cols["sample_rate"], dtype="Int64"),
                "n_samples": pd.Series(cols["n_samples"], dtype="Int64"),
                "sum_samples": pd.Series(cols["sum_samples"], dtype="Int64"),
                "sum_abs": pd.Series(cols["sum_abs"], dtype="Int64"),
                "first_sample": pd.Series(cols["first_sample"], dtype="Int32"),
                "last_sample": pd.Series(cols["last_sample"], dtype="Int32"),
            }
        )


@query(
    "q_multimodal_g711_decode",
    oracle="""
WITH g AS (
  SELECT doc_id, doc_id % 200 + 50 AS n, doc_id % 2 AS even FROM documents
),
dec AS (
  SELECT doc_id, n, even,
    CASE WHEN even = 0 THEN
      list_transform([(doc_id*13 + i*7) % 256 for i in generate_series(0, n-1)],
        v -> (CASE WHEN (255 - v) >= 128 THEN -1 ELSE 1 END)
             * ((((255 - v) % 16) * 8 + 132) * (1 << (((255 - v) // 16) % 8)) - 132))
    ELSE
      list_transform([(doc_id*13 + i*7) % 256 for i in generate_series(0, n-1)],
        v -> (CASE WHEN xor(v, 85) >= 128 THEN 1 ELSE -1 END)
             * (CASE WHEN ((xor(v, 85) // 16) % 8) = 0
                     THEN (xor(v, 85) % 16) * 16 + 8
                     ELSE ((xor(v, 85) % 16) * 16 + 264)
                          * (1 << (((xor(v, 85) // 16) % 8) - 1)) END))
    END AS s
  FROM g
)
SELECT doc_id,
  CASE WHEN doc_id % 13 = 0 THEN NULL
       WHEN even = 0 THEN 'ulaw' ELSE 'alaw' END AS codec,
  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(8000 AS BIGINT) END AS sample_rate,
  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(n AS BIGINT) END AS n_samples,
  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(list_sum(s) AS BIGINT) END
    AS sum_samples,
  CASE WHEN doc_id % 13 = 0 THEN NULL
       ELSE CAST(list_sum(list_transform(s, x -> abs(x))) AS BIGINT) END AS sum_abs,
  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(s[1] AS INT) END AS first_sample,
  CASE WHEN doc_id % 13 = 0 THEN NULL ELSE CAST(s[n] AS INT) END AS last_sample
FROM dec ORDER BY doc_id
""",
    group="llm-multimodal",
)
def q_multimodal_g711_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-audio decode end-to-end with no audio libs (r13):
    every document becomes a spec-valid G.711 companded WAV — mu-law and
    A-law alternating by doc, fmt tag 7/6 with the non-PCM cbSize
    extension and a fact chunk — and the engine must walk the RIFF
    chunks manually (stdlib ``wave`` rejects non-PCM) and expand each
    byte through the ITU-T G.711 formulas (segment + mantissa, mu-law's
    complement vs A-law's even-bit inversion and INVERTED sign
    convention).  The oracle recomputes the same closed-form expansion,
    so a decoder with the wrong bias, shift, or polarity fails the
    hash; every 13th payload is tail-truncated (data chunk shorter than
    declared) and must route to nulls.  Scale shape: two map-only Arrow
    ``mapInPandas`` stages, no shuffle."""
    prepare(spark)
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = d.mapInPandas(
        synth_g711_payloads,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        ),
    )
    return payloads.mapInPandas(g711_stats, G711_SCHEMA).orderBy("doc_id")

# ---------------------------------------------------------------------------
# REAL GIF decode end-to-end (r13): LZW entropy decode lives in
# operators/gif.py — the third distinct entropy coder in the image
# suite (PNG: deflate, JPEG: Huffman+DCT, GIF: LZW)
# ---------------------------------------------------------------------------


def _gif_ncolors(doc_id: int) -> int:
    """Synthesis palette size by doc: 4 / 8 / 16 colors."""
    return 1 << (doc_id % 3 + 2)


def _gif_index(doc_id: int, r: int, c: int) -> int:
    """Palette index both engines compute; the palette maps index ``i``
    to ``(i*5 % 256, i*11 % 256, i*17 % 256)``."""
    return (doc_id * 7 + r * 13 + c * 3) % _gif_ncolors(doc_id)


def _mk_real_gif(doc_id: int, w: int, h: int, interlace: bool = False) -> bytes:
    """A spec-valid GIF89a: logical screen + global color table, a
    graphic-control extension (exercises sub-block skipping), one image
    frame whose indices are REALLY LZW-compressed (``operators/gif.py``),
    stored row-major or 4-pass interlaced, data split into <=255-byte
    sub-blocks."""
    from .gif import _GIF_PASSES, lzw_encode

    nc = _gif_ncolors(doc_id)
    mcs = max(2, nc.bit_length() - 1)
    gct = bytes(v for i in range(nc) for v in (i * 5 % 256, i * 11 % 256, i * 17 % 256))
    flags = 0x80 | (nc.bit_length() - 2)  # GCT present, size 2^(n+1)
    head = (
        b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([flags, 0, 0]) + gct
        + b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
    )
    if interlace:
        order = [r for start, step in _GIF_PASSES for r in range(start, h, step)]
    else:
        order = list(range(h))
    idx = [_gif_index(doc_id, r, c) for r in order for c in range(w)]
    data = lzw_encode(idx, mcs)
    body = bytearray(
        b"\x2c" + bytes(4) + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x40 if interlace else 0x00, mcs])
    )
    for j in range(0, len(data), 255):
        blk = data[j : j + 255]
        body += bytes([len(blk)]) + blk
    body += b"\x00\x3b"  # block terminator + trailer
    return head + bytes(body)


GIF_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("n_colors", T.LongType(), True),
        T.StructField("sum_r", T.LongType(), True),
        T.StructField("sum_g", T.LongType(), True),
        T.StructField("sum_b", T.LongType(), True),
    ]
)


def synth_gif_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic GIF corpus: doc_id-derived geometry, palette size,
    and indices; every 6th payload (offset 1) stored INTERLACED (same
    pixels — only a real 4-pass deinterlacer matches); every 29th
    payload truncated mid-stream and must route to nulls (GIF carries
    no CRC, so truncation is the deterministic corruption)."""
    for pdf in batches:
        out = []
        for doc_id in pdf["doc_id"]:
            d = int(doc_id)
            p = _mk_real_gif(d, d % 11 + 3, d % 8 + 3, interlace=(d % 6 == 1))
            if d % 29 == 0:
                p = p[: len(p) // 2]
            out.append(p)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})


def gif_channel_sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL GIF decode + channel statistics over Arrow batches;
    undecodable payloads yield null analysis columns.

    Channel sums fold through the PALETTE instead of expanded pixels
    (r13-opt, guide §4.2): ``sum_ch = bincount(indices) . palette[ch]``
    — integer-exact reassociation of the per-pixel sum, O(pixels) in C
    (``np.bincount`` over the index bytes) + O(palette) in Python,
    where the tuple expansion was O(pixels) interpreted.  Pinned
    value-identical to the expanded-pixel sums in
    tests/test_multimodal.py::TestGifChannelSumsR13Opt."""
    import numpy as np

    from .gif import decode_gif_indexed

    for pdf in batches:
        cols: dict[str, list] = {
            "width": [], "height": [], "n_colors": [],
            "sum_r": [], "sum_g": [], "sum_b": [],
        }
        for b in pdf["payload"]:
            dec = decode_gif_indexed(bytes(b))
            if dec is None:
                for k in cols:
                    cols[k].append(None)
                continue
            w, h, pal, idx = dec
            counts = np.bincount(
                np.frombuffer(idx, dtype=np.uint8), minlength=len(pal)
            )
            sums = counts @ np.asarray(pal, dtype=np.int64)
            cols["width"].append(w)
            cols["height"].append(h)
            cols["n_colors"].append(len(pal))
            cols["sum_r"].append(int(sums[0]))
            cols["sum_g"].append(int(sums[1]))
            cols["sum_b"].append(int(sums[2]))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": pd.Series(cols["width"], dtype="Int64"),
                "height": pd.Series(cols["height"], dtype="Int64"),
                "n_colors": pd.Series(cols["n_colors"], dtype="Int64"),
                "sum_r": pd.Series(cols["sum_r"], dtype="Int64"),
                "sum_g": pd.Series(cols["sum_g"], dtype="Int64"),
                "sum_b": pd.Series(cols["sum_b"], dtype="Int64"),
            }
        )


@query(
    "q_multimodal_gif_decode",
    oracle="""
WITH g AS (
  SELECT doc_id, doc_id % 11 + 3 AS w, doc_id % 8 + 3 AS h,
         (1 << (doc_id % 3 + 2)) AS nc
  FROM documents
),
px AS (
  SELECT doc_id, w, h, nc,
    list_sum([(((doc_id*7 + (i//w)*13 + (i%w)*3) % nc) * 5) % 256
              for i in generate_series(0, w*h - 1)]) AS sr,
    list_sum([(((doc_id*7 + (i//w)*13 + (i%w)*3) % nc) * 11) % 256
              for i in generate_series(0, w*h - 1)]) AS sg,
    list_sum([(((doc_id*7 + (i//w)*13 + (i%w)*3) % nc) * 17) % 256
              for i in generate_series(0, w*h - 1)]) AS sb
  FROM g
)
SELECT doc_id,
  CASE WHEN doc_id % 29 = 0 THEN NULL ELSE CAST(w AS BIGINT) END AS width,
  CASE WHEN doc_id % 29 = 0 THEN NULL ELSE CAST(h AS BIGINT) END AS height,
  CASE WHEN doc_id % 29 = 0 THEN NULL ELSE CAST(nc AS BIGINT) END AS n_colors,
  CASE WHEN doc_id % 29 = 0 THEN NULL ELSE CAST(sr AS BIGINT) END AS sum_r,
  CASE WHEN doc_id % 29 = 0 THEN NULL ELSE CAST(sg AS BIGINT) END AS sum_g,
  CASE WHEN doc_id % 29 = 0 THEN NULL ELSE CAST(sb AS BIGINT) END AS sum_b
FROM px ORDER BY doc_id
""",
    group="llm-multimodal",
)
def q_multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL GIF decode end-to-end with no imaging libs (r13): every
    document becomes a spec-valid GIF89a — doc_id-derived geometry,
    4/8/16-color global palette, indices REALLY LZW-compressed with
    variable code widths — and the engine must walk the blocks, skip the
    extension's sub-block chain, reassemble the image sub-blocks, run
    the LZW dictionary decode (CLEAR/EOI, KwK case, width growth), and
    expand indices through the color table (``operators/gif.py``).  The
    oracle recomputes the palette arithmetic, so a decoder that
    mis-times the code-width increase or mis-orders interlaced rows
    fails the hash; every 6th payload is stored 4-pass INTERLACED (same
    pixels, oracle unchanged) and every 29th is truncated mid-stream and
    must route to nulls.  Scale shape: two map-only Arrow
    ``mapInPandas`` stages, no shuffle."""
    prepare(spark)
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = d.mapInPandas(
        synth_gif_payloads,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("payload", T.BinaryType(), False),
            ]
        ),
    )
    return payloads.mapInPandas(gif_channel_sums, GIF_SCHEMA).orderBy("doc_id")
