"""GIF87a/89a decode — stdlib only, including the REAL LZW entropy
decoder.

Completes the image-codec trio alongside PNG (deflate, ``multimodal``)
and baseline JPEG (Huffman+DCT, ``jpeg``): header + logical screen
descriptor, global/local color tables, extension-block skipping, image
descriptor, variable-code-width LZW with CLEAR/EOI handling, dictionary
growth to 4096 entries with deferred width increase, the KwK
(code == next_entry) case, 4-pass row interlacing, and palette
expansion to RGB.  Scope: the FIRST image frame (animation frames
beyond the first are ignored, as a feature extractor samples frames
anyway).  Anything malformed — truncation, bad code, index overflow,
frame larger than the logical screen — returns ``None``; decode never
raises.
"""

from __future__ import annotations

# GIF interlace pass geometry: (row_start, row_step) per GIF89a app. E
_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


#: the 256 one-pixel dictionary entries, shared by every decode call —
#: entries are ``bytes`` so the hot loop's copies (``out += entry``,
#: ``prev + entry[:1]``) run as C memcpy instead of per-int list work
#: (r13-opt, guide §4.2: interleaved min-of-7 A/B vs the list-based
#: decoder — 1.4x on a 64 KiB random frame (26.9 -> 19.3 ms), 1.2x on
#: the bench corpus' <=130 px frames (73 -> 61 us); byte-for-byte
#: differential over 7k valid + malformed streams in
#: tests/test_multimodal.py::TestLzwDecoderR13Opt)
_SINGLE_PX = [bytes((i,)) for i in range(256)]


def lzw_decode(data: bytes, min_code_size: int, npixels: int) -> list[int]:
    """GIF-flavor LZW decode to a list of pixel indices — thin wrapper
    over :func:`lzw_decode_bytes` (the public list contract predates the
    bytes core; sites that only aggregate take the bytes directly)."""
    return list(lzw_decode_bytes(data, min_code_size, npixels))


def lzw_decode_bytes(data: bytes, min_code_size: int, npixels: int) -> bytes:
    """GIF-flavor LZW: initial width ``min_code_size + 1``, CLEAR resets
    the dictionary, EOI terminates, dictionary grows to 4095 with the
    width increasing when the next entry would not fit.  Raises on any
    malformation (code beyond next entry, pixel overflow/underflow).

    The LSB-first variable-width code reader is inlined as an int
    reservoir (``acc``/``nbits``); dictionary entries are ``bytes`` and
    the output accumulates in a ``bytearray`` (pixel indices are always
    < 256 — ``min_code_size <= 8``)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError("bad LZW min code size")
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    single = _SINGLE_PX
    table: list[bytes] = []
    width = min_code_size + 1
    nxt = eoi + 1
    prev: bytes | None = None
    out = bytearray()
    pos = acc = nbits = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise EOFError
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table, nxt, width, prev = [], eoi + 1, min_code_size + 1, None
            continue
        if code == eoi:
            break
        if code < clear:
            entry = single[code]
        elif code - eoi - 1 < len(table):
            entry = table[code - eoi - 1]
        elif code == nxt and prev is not None:
            entry = prev + prev[:1]  # the KwK case
        else:
            raise ValueError("LZW code beyond dictionary")
        out += entry
        if len(out) > npixels:
            raise ValueError("LZW output overflows frame")
        if prev is not None and nxt < 4096:
            table.append(prev + entry[:1])
            nxt += 1
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) == npixels:
            # consume a possible trailing EOI; tolerate its absence
            try:
                while nbits < width:
                    if pos >= n:
                        raise EOFError
                    acc |= data[pos] << nbits
                    pos += 1
                    nbits += 8
                acc >>= width
                nbits -= width
            except EOFError:
                pass
            break
    if len(out) != npixels:
        raise ValueError("LZW output short of frame")
    return bytes(out)


def lzw_encode(pixels: list[int], min_code_size: int) -> bytes:
    """The matching GIF LZW encoder (synthesis side): leading CLEAR,
    dictionary growth symmetric with the decoder (the encoder widens one
    assignment AHEAD of the decoder — it emits the code that uses the
    new entry, the decoder learns that entry one code later), dictionary
    frozen at 4096 entries (deferred clear — the decoder mirrors the
    freeze), trailing EOI."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, ...], int] = {}
    nxt = eoi + 1
    put(clear, width)
    w: tuple[int, ...] = ()
    for k in pixels:
        if not 0 <= k < clear:
            raise ValueError("pixel outside code space")
        wk = w + (k,)
        if len(wk) == 1 or wk in table:
            w = wk
            continue
        put(table[w] if len(w) > 1 else w[0], width)
        if nxt < 4096:
            table[wk] = nxt
            nxt += 1
            if nxt == (1 << width) + 1 and width < 12:
                width += 1
        w = (k,)
    if w:
        put(table[w] if len(w) > 1 else w[0], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(
    payload: bytes,
) -> "tuple[int, int, int, list[list[tuple[int, int, int]]]] | None":
    """Decode the first frame of a GIF to ``(width, height, n_colors,
    rows)`` of RGB tuples — :func:`decode_gif_indexed` plus the palette
    expansion.  Aggregating consumers (channel statistics) should take
    the indexed form directly: the per-pixel tuple materialization here
    is the expensive part for large frames."""
    g = decode_gif_indexed(payload)
    if g is None:
        return None
    w, h, pal, idx = g
    rows = [[pal[v] for v in idx[r * w : (r + 1) * w]] for r in range(h)]
    return w, h, len(pal), rows


def decode_gif_indexed(
    payload: bytes,
) -> "tuple[int, int, list[tuple[int, int, int]], bytes] | None":
    """Decode the first frame of a GIF to ``(width, height, palette,
    indices)`` with ``indices`` the row-major (de-interlaced) pixel
    index stream as ``bytes``.  Walks the logical screen descriptor,
    global color table, extension blocks (sub-block chains skipped),
    and the first image descriptor; concatenates the image's data
    sub-blocks and LZW-decodes them.  Bytes in, bytes out: a vectorized
    consumer can ``np.frombuffer`` the indices and fold through the
    palette without ever expanding pixels in Python (guide §4.2)."""
    try:
        if payload[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        sw = int.from_bytes(payload[6:8], "little")
        sh = int.from_bytes(payload[8:10], "little")
        flags = payload[10]
        i = 13
        gct: list[tuple[int, int, int]] | None = None
        if flags & 0x80:
            n = 2 << (flags & 0x07)
            gct = [tuple(payload[i + 3 * k : i + 3 * k + 3]) for k in range(n)]
            i += 3 * n
        while i < len(payload):
            b = payload[i]
            i += 1
            if b == 0x3B:  # trailer before any image
                return None
            if b == 0x21:  # extension: label + sub-block chain
                i += 1
                while True:
                    if i >= len(payload):
                        return None
                    sz = payload[i]
                    i += 1 + sz
                    if sz == 0:
                        break
                continue
            if b != 0x2C:  # image descriptor is all that remains
                return None
            left = int.from_bytes(payload[i : i + 2], "little")
            top = int.from_bytes(payload[i + 2 : i + 4], "little")
            w = int.from_bytes(payload[i + 4 : i + 6], "little")
            h = int.from_bytes(payload[i + 6 : i + 8], "little")
            iflags = payload[i + 8]
            i += 9
            if w == 0 or h == 0 or left + w > sw or top + h > sh:
                return None
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = [tuple(payload[i + 3 * k : i + 3 * k + 3]) for k in range(n)]
                i += 3 * n
            if pal is None:
                return None
            mcs = payload[i]
            i += 1
            data = bytearray()
            while True:
                if i >= len(payload):
                    return None  # truncated sub-block chain
                sz = payload[i]
                i += 1
                if sz == 0:
                    break
                if i + sz > len(payload):
                    return None
                data += payload[i : i + sz]
                i += sz
            idx = lzw_decode_bytes(bytes(data), mcs, w * h)
            if max(idx) >= len(pal):
                return None
            if iflags & 0x40:  # interlaced: 4-pass row order
                out = bytearray(w * h)
                src = 0
                for start, step in _GIF_PASSES:
                    for r in range(start, h, step):
                        out[r * w : (r + 1) * w] = idx[src * w : (src + 1) * w]
                        src += 1
                idx = bytes(out)
            return w, h, pal, idx
        return None
    except Exception:  # noqa: BLE001 - any parse failure routes to None
        return None
