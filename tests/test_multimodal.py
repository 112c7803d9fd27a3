"""Unit coverage for the REAL multimodal header sniffer (r10): format
magic, per-format endianness, the JPEG marker walk, and the never-raise
contract on malformed input.  (The end-to-end mapInPandas path is
oracle-checked via q_multimodal_sniff in the registry parity sweep.)"""

from __future__ import annotations

from anglerfish_spark.operators.multimodal import (
    _mk_gif,
    _mk_jpeg,
    _mk_png,
    _mk_wav,
    sniff_container,
)


class TestSniffContainer:
    def test_png_big_endian_dims(self):
        assert sniff_container(_mk_png(640, 360, b"x")) == ("png", 640, 360, None)

    def test_jpeg_walks_past_app0(self):
        assert sniff_container(_mk_jpeg(1920, 1080, b"x")) == ("jpeg", 1920, 1080, None)

    def test_gif_little_endian_dims(self):
        assert sniff_container(_mk_gif(320, 200, b"x")) == ("gif", 320, 200, None)

    def test_wav_sample_rate(self):
        assert sniff_container(_mk_wav(44100, b"\x00\x01")) == ("wav", None, None, 44100)

    def test_truncated_payloads_are_unknown_not_crashes(self):
        for full in (
            _mk_png(10, 10, b""),
            _mk_jpeg(10, 10, b""),
            _mk_gif(10, 10, b""),
            _mk_wav(8000, b""),
        ):
            for cut in (0, 1, 3, 7):
                fmt, w, h, sr = sniff_container(full[:cut])
                assert fmt == "unknown" and w is None and h is None and sr is None

    def test_jpeg_malformed_segment_length_stops_walk(self):
        # a segment claiming length < 2 must not loop forever or raise
        bad = b"\xff\xd8\xff\xe0\x00\x01" + b"\x00" * 8
        assert sniff_container(bad) == ("unknown", None, None, None)

    def test_endianness_not_interchangeable(self):
        # a GIF header read as big-endian would yield 0x4001 != 320
        fmt, w, h, _ = sniff_container(_mk_gif(320, 1, b""))
        assert (w, h) == (320, 1)

    def test_arbitrary_bytes_unknown(self):
        assert sniff_container(b"not media at all")[0] == "unknown"
        assert sniff_container(b"")[0] == "unknown"
