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


class TestPngDecode:
    """r13 (VERDICT r12 #5): the grayscale-PNG decoder's five filter
    unfilterings are ALL exercised directly — the synthesis now emits
    row % 5 filters, and this unit pins each filter type's round-trip
    plus the malformed-geometry refusals."""

    def test_all_five_filters_round_trip(self):
        from anglerfish_spark.operators.multimodal import (
            _mk_real_png,
            _png_pixel,
            decode_png,
        )

        # h >= 5 guarantees rows with filter types 0..4 all appear
        for doc_id, w, h in [(1, 4, 6), (5, 7, 9), (12, 3, 5)]:
            payload = _mk_real_png(doc_id, w, h)
            got = decode_png(payload)
            assert got is not None
            gw, gh, rows = got
            assert (gw, gh) == (w, h)
            want = [[_png_pixel(doc_id, r, c) for c in range(w)] for r in range(h)]
            assert rows == want

    def test_synthesis_emits_every_filter_type(self):
        import zlib

        from anglerfish_spark.operators.multimodal import _mk_real_png

        payload = _mk_real_png(3, 5, 10)
        # pull the IDAT back out and check the per-row filter bytes
        i, idat = 8, b""
        while i + 8 <= len(payload):
            ln = int.from_bytes(payload[i : i + 4], "big")
            typ = payload[i + 4 : i + 8]
            if typ == b"IDAT":
                idat += payload[i + 8 : i + 8 + ln]
            i += 12 + ln
        raw = zlib.decompress(idat)
        fts = {raw[r * 6] for r in range(10)}
        assert fts == {0, 1, 2, 3, 4}

    def test_malformed_geometry_refuses_not_crashes(self):
        import zlib

        from anglerfish_spark.operators.multimodal import _mk_real_png, decode_png

        def chunk(typ: bytes, data: bytes) -> bytes:
            return (
                len(data).to_bytes(4, "big") + typ + data
                + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
            )

        # zero-width image: IDAT length can never match h * (w + 1) = h
        ihdr = (0).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
        zero_w = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes([0, 1] * 4)))
            + chunk(b"IEND", b"")
        )
        assert decode_png(zero_w) is None
        # bad inflated length: one trailing byte beyond h * (w + 1)
        good = _mk_real_png(2, 3, 4)
        # rebuild with an extra byte in the IDAT stream
        i = 8
        out = bytearray(b"\x89PNG\r\n\x1a\n")
        while i + 8 <= len(good):
            ln = int.from_bytes(good[i : i + 4], "big")
            typ = good[i + 4 : i + 8]
            data = good[i + 8 : i + 8 + ln]
            if typ == b"IDAT":
                data = zlib.compress(zlib.decompress(data) + b"\x00")
            out += chunk(typ, data)
            i += 12 + ln
        assert decode_png(bytes(out)) is None
        # unknown filter byte (5): refuse the scanline
        bad_ft = zlib.decompress(
            next(
                good[j + 8 : j + 8 + int.from_bytes(good[j : j + 4], "big")]
                for j in range(8, len(good))
                if good[j + 4 : j + 8] == b"IDAT"
            )
        )
        bad = bytearray(bad_ft)
        bad[0] = 5
        mangled = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", (3).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([8, 0, 0, 0, 0]))
            + chunk(b"IDAT", zlib.compress(bytes(bad)))
            + chunk(b"IEND", b"")
        )
        assert decode_png(bytes(mangled)) is None
