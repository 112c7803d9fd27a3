"""Baseline JPEG (ITU-T T.81) grayscale decode — stdlib only.

The REAL decode path for the last env-stubbed image codec: marker/segment
walk (SOI, APPn/COM skip, DQT, DHT, SOF0, DRI, SOS, EOI), canonical
Huffman table construction per spec Annex C, entropy decode of the scan
with 0xFF byte-stuffing and restart-marker handling, DC differential +
AC run-length/EOB/ZRL coefficient decode, dequantization, zigzag
de-serialization, separable 2-D IDCT, level shift, and edge-block crop.
Scope is honest: baseline sequential, 8-bit, single-component
(grayscale) frames — progressive (SOF2), multi-component chroma
subsampling, and arithmetic coding return ``None`` rather than pretend.

Anything malformed — truncated scan, bad marker, invalid Huffman code,
coefficient index overflow — returns ``None``; decode never raises.
"""

from __future__ import annotations


def _zigzag() -> list[tuple[int, int]]:
    """The spec's zigzag coefficient order (T.81 figure 5) as (row, col)."""
    order: list[tuple[int, int]] = []
    for d in range(15):
        cells = [(r, d - r) for r in range(max(0, d - 7), min(d, 7) + 1)]
        if d % 2 == 0:
            cells.reverse()
        order.extend(cells)
    return order


ZIGZAG = _zigzag()
# zigzag position of coefficient (u, v): ZZ_POS[u][v]
ZZ_POS = [[0] * 8 for _ in range(8)]
for _k, (_r, _c) in enumerate(ZIGZAG):
    ZZ_POS[_r][_c] = _k

import math
from functools import lru_cache as _lru_cache

# separable IDCT basis: _COS[u][x] = c(u) * cos((2x+1) u pi / 16)
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0) * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]

# numpy fast path for the IDCT only (the parse/entropy decode is stdlib
# either way; numpy is a numerics library, not an imaging codec) — the
# pure-Python IDCT below stays as the always-available reference and the
# two are pinned equal in tests
try:  # pragma: no cover - import guard
    import numpy as _np

    _COS_NP = _np.array(_COS)
    _ZZ_FLAT = _np.array([r * 8 + c for r, c in ZIGZAG])
except Exception:  # noqa: BLE001
    _np = None


def build_huffman(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman table per T.81 Annex C: ``bits[i]`` codes of
    length ``i+1``, values assigned in ``huffval`` order.  Returns
    ``(code_length, code) -> value``."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            if k >= len(huffval):
                raise ValueError("DHT count exceeds values")
            table[(ln, code)] = huffval[k]
            k += 1
            code += 1
        code <<= 1
        if code > (1 << ln) << 1:
            raise ValueError("DHT code overflow")
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded scan with 0xFF
    byte-stuffing removal; raises ``EOFError`` at a marker or end of
    data (the caller treats both as malformed unless it expected a
    restart).

    Bits buffer in an int reservoir one source byte at a time:
    ``_fill`` consumes a byte (plus its stuffed 0x00) only when a bit
    is actually needed, so a marker or truncation raises on exactly
    the read that would touch it — same outcome as the per-bit reader
    it replaced.

    r13-opt adds :meth:`try_fill8`, a NON-raising opportunistic fill for
    the 8-bit Huffman lookahead (it stops silently at a marker or at end
    of data, leaving the slow path to raise on exactly the bit-consume
    that would touch it — same outcome as before).  Lookahead means the
    reservoir can now hold ONE whole unconsumed byte when a consume
    takes fewer bits than were prefetched (never more: every fill stops
    at <8 missing bits, and every consume ends ≤15 bits buffered), so
    ``align_to_marker`` un-reads it via ``lastpos`` before scanning —
    restart byte-alignment semantics are unchanged."""

    __slots__ = ("data", "pos", "buf", "nbits", "lastpos")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0
        self.lastpos = pos

    def _fill(self) -> None:
        data, pos = self.data, self.pos
        if pos >= len(data):
            raise EOFError
        b = data[pos]
        if b == 0xFF:
            nxt = data[pos + 1] if pos + 1 < len(data) else None
            if nxt != 0x00:
                raise EOFError  # a real marker (or truncation) terminates
            self.lastpos = pos
            self.pos = pos + 2  # consume the stuffed literal 0xFF
        else:
            self.lastpos = pos
            self.pos = pos + 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def try_fill8(self) -> int:
        """Fill the reservoir to >= 8 bits if the stream allows; NEVER
        raises (a marker or truncation just stops the fill).  Returns
        the resulting bit count so callers can fall back to the
        bit-serial path — which raises on exactly the consume that
        would touch the marker, as always — when fewer than 8 bits are
        legally available."""
        data = self.data
        n = len(data)
        while self.nbits < 8:
            pos = self.pos
            if pos >= n:
                break
            b = data[pos]
            if b == 0xFF:
                if pos + 1 >= n or data[pos + 1] != 0x00:
                    break  # marker or truncation: stop, do not raise
                self.lastpos = pos
                self.pos = pos + 2
            else:
                self.lastpos = pos
                self.pos = pos + 1
            self.buf = (self.buf << 8) | b
            self.nbits += 8
        return self.nbits

    def next_bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        v = (self.buf >> self.nbits) & 1
        self.buf &= (1 << self.nbits) - 1
        return v

    def receive(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.buf >> self.nbits) & ((1 << n) - 1)
        self.buf &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> int:
        """Byte-align (discard the current byte's unread tail) and
        consume one marker (for restart intervals); returns the
        marker's second byte.  A whole byte the lookahead prefetched
        but never consumed is UN-read first (bits consume oldest-first,
        so >= 8 buffered bits mean the newest filled byte is untouched
        — its source position is ``lastpos``); the marker scan then
        starts exactly where the bit-serial reader's would."""
        if self.nbits >= 8:
            if self.nbits >= 16:  # unreachable: consumes end <= 15 bits
                raise EOFError
            self.pos = self.lastpos
        self.buf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF:
            m = self.data[self.pos + 1]
            if m == 0xFF:
                self.pos += 1  # fill byte
                continue
            self.pos += 2
            return m
        raise EOFError


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a ``t``-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


@_lru_cache(maxsize=256)
def _huffman_arrays(
    bits: bytes, huffval: bytes
) -> tuple[list[int], list[int], list[bytes]]:
    """Canonical-decode arrays per T.81 F.16 DECODE, built straight from
    the DHT payload: per code length ``maxcode`` (-1 when the length has
    no codes), ``mincode``, and the values indexed by
    ``code - mincode`` (canonical codes of one length are consecutive).
    Validation (count overrun, code overflow) raises exactly where
    ``build_huffman`` does.  Cached per distinct table content — scans
    of a corpus reuse a handful of tables (most encoders emit the Annex
    K defaults), so table construction amortizes to a dict hit."""
    maxcode = [-1] * 17
    mincode = [0] * 17
    values: list[bytes] = [b""] * 17
    code, k = 0, 0
    for ln in range(1, 17):
        n = bits[ln - 1]
        if n:
            if k + n > len(huffval):
                raise ValueError("DHT count exceeds values")
            mincode[ln] = code
            values[ln] = huffval[k : k + n]
            code += n
            k += n
            maxcode[ln] = code - 1
        code <<= 1
        if code > (1 << ln) << 1:
            raise ValueError("DHT code overflow")
    return maxcode, mincode, values


@_lru_cache(maxsize=256)
def _lookahead_table(bits: bytes, huffval: bytes) -> "list[tuple[int, int] | None]":
    """8-bit Huffman lookahead (the T.81 F.2.2.3 FAST-path idea): entry
    ``idx`` holds ``(code_length, value)`` when the canonical code
    spelled by the top bits of ``idx`` completes within 8 bits, else
    ``None`` (longer codes fall back to the bit-serial walk).  Built by
    the same mincode/maxcode walk the decoder uses, so the table is
    definitionally consistent with it; cached per distinct DHT content
    alongside :func:`_huffman_arrays`."""
    maxcode, mincode, values = _huffman_arrays(bits, huffval)
    look: "list[tuple[int, int] | None]" = [None] * 256
    for idx in range(256):
        code = 0
        for ln in range(1, 9):
            code = (code << 1) | ((idx >> (8 - ln)) & 1)
            if code <= maxcode[ln]:
                look[idx] = (ln, values[ln][code - mincode[ln]])
                break
    return look


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.next_bit()
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("invalid Huffman code")


def decode_jpeg_gray(payload: bytes) -> "tuple[int, int, list[list[int]]] | None":
    """Decode a baseline grayscale JPEG to ``(width, height, rows)`` of
    pixel values 0..255; ``None`` for anything malformed or any feature
    outside baseline/8-bit/single-component scope."""
    try:
        data = payload
        if data[:2] != b"\xff\xd8":
            return None
        qt: dict[int, list[int]] = {}
        hf: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
        w = h = None
        tq_sel = td = ta = None
        restart = 0
        i = 2
        while True:
            if i + 1 >= len(data):
                return None
            if data[i] != 0xFF:
                return None
            while i < len(data) and data[i] == 0xFF:
                i += 1  # fill bytes
            m = data[i]
            i += 1
            if m == 0xD9:  # EOI before a complete scan
                return None
            if m in (0x01,) or 0xD0 <= m <= 0xD7:  # TEM / RSTn: no segment
                continue
            if i + 2 > len(data):
                return None
            ln = int.from_bytes(data[i : i + 2], "big")
            seg = data[i + 2 : i + ln]
            if ln < 2 or i + ln > len(data):
                return None
            if m == 0xDB:  # DQT
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 0x0F
                    if pq != 0:  # 16-bit tables out of scope
                        return None
                    if j + 65 > len(seg):
                        return None
                    qt[tq] = list(seg[j + 1 : j + 65])
                    j += 65
            elif m == 0xC4:  # DHT
                j = 0
                while j + 17 <= len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 0x0F
                    bits = list(seg[j + 1 : j + 17])
                    n = sum(bits)
                    if j + 17 + n > len(seg):
                        return None
                    hv = bytes(seg[j + 17 : j + 17 + n])
                    hf[(tc, th)] = (
                        _huffman_arrays(bytes(bits), hv),
                        _lookahead_table(bytes(bits), hv),
                    )
                    j += 17 + n
            elif m == 0xC0:  # SOF0 baseline
                if seg[0] != 8:
                    return None
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                if seg[5] != 1 or seg[7] != 0x11:  # grayscale, 1x1 sampling
                    return None
                tq_sel = seg[8]
            elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                       0xCD, 0xCE, 0xCF):
                return None  # non-baseline frame types out of scope
            elif m == 0xDD:  # DRI
                restart = int.from_bytes(seg[0:2], "big")
            elif m == 0xDA:  # SOS
                if w is None or seg[0] != 1:
                    return None
                td, ta = seg[2] >> 4, seg[2] & 0x0F
                if seg[3] != 0 or seg[4] != 63 or seg[5] != 0:
                    return None  # baseline spectral selection only
                i += ln
                break
            i += ln
        if (0, td) not in hf or (1, ta) not in hf or tq_sel not in qt:
            return None
        if w == 0 or h == 0:
            return None
        # canonical-decode arrays (T.81 F.16) + the r13-opt 8-bit
        # lookahead: most symbols resolve with ONE table index on the
        # prefetched reservoir; codes longer than 8 bits (or a reservoir
        # the stream cannot legally fill to 8) fall back to the
        # bit-serial walk, which raises on exactly the read that would
        # touch a marker or truncation — unchanged error semantics
        ((dmax, dmin, dvals), dlook) = hf[(0, td)]
        ((amax, amin, avals), alook) = hf[(1, ta)]
        q = qt[tq_sel]
        bw, bh = (w + 7) // 8, (h + 7) // 8
        img = [[0] * w for _ in range(h)]
        br = _BitReader(data, i)
        next_bit, receive, try_fill8 = br.next_bit, br.receive, br.try_fill8
        pred = 0
        for bi in range(bw * bh):
            if restart and bi and bi % restart == 0:
                m = br.align_to_marker()
                if not 0xD0 <= m <= 0xD7:
                    return None
                pred = 0
            coef = [0.0] * 64
            t = None
            if br.nbits >= 8 or try_fill8() >= 8:
                e = dlook[(br.buf >> (br.nbits - 8)) & 0xFF]
                if e is not None:
                    ln, t = e
                    br.nbits -= ln
                    br.buf &= (1 << br.nbits) - 1
            if t is None:
                code, ln = next_bit(), 1
                while code > dmax[ln]:
                    if ln >= 16:
                        raise ValueError("invalid Huffman code")
                    code = (code << 1) | next_bit()
                    ln += 1
                t = dvals[ln][code - dmin[ln]]
            if t > 11:
                return None
            pred += _extend(receive(t), t)
            coef[0] = pred * q[0]
            k = 1
            while k < 64:
                rs = None
                if br.nbits >= 8 or try_fill8() >= 8:
                    e = alook[(br.buf >> (br.nbits - 8)) & 0xFF]
                    if e is not None:
                        ln, rs = e
                        br.nbits -= ln
                        br.buf &= (1 << br.nbits) - 1
                if rs is None:
                    code, ln = next_bit(), 1
                    while code > amax[ln]:
                        if ln >= 16:
                            raise ValueError("invalid Huffman code")
                        code = (code << 1) | next_bit()
                        ln += 1
                    rs = avals[ln][code - amin[ln]]
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16  # ZRL
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    return None
                coef[k] = _extend(receive(s), s) * q[k]
                k += 1
            # de-zigzag into (u, v), then separable IDCT
            by, bx = divmod(bi, bw)
            if _np is not None:
                cm = _np.zeros(64)
                cm[_ZZ_FLAT] = coef
                sp = 0.25 * (_COS_NP.T @ cm.reshape(8, 8) @ _COS_NP)
                vals = (_np.rint(sp).astype(_np.int64) + 128).clip(0, 255)
                ch = min(8, h - by * 8)
                cw = min(8, w - bx * 8)
                x0 = bx * 8
                rows = vals[:ch, :cw].tolist()
                for y in range(ch):
                    img[by * 8 + y][x0 : x0 + cw] = rows[y]
                continue
            cuv = [[0.0] * 8 for _ in range(8)]
            for kk in range(64):
                if coef[kk]:
                    r, c = ZIGZAG[kk]
                    cuv[r][c] = coef[kk]
            tmp = [
                [sum(cuv[u][v] * _COS[v][y] for v in range(8) if cuv[u][v])
                 for y in range(8)]
                for u in range(8)
            ]
            for x in range(8):
                px = bx * 8 + x
                if px >= w:
                    continue
                for y in range(8):
                    py = by * 8 + y
                    if py >= h:
                        continue
                    s_val = 0.25 * sum(
                        _COS[u][y] * tmp[u][x] for u in range(8) if tmp[u][x]
                    )
                    img[py][px] = min(255, max(0, round(s_val) + 128))
        return w, h, img
    except Exception:  # noqa: BLE001 - any parse failure routes to None
        return None
