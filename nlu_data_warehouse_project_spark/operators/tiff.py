"""Baseline TIFF decode (TIFF 6.0, the public Adobe spec) — the
document/scan-crawl format: II/MM endianness, IFD tag walk, strip
assembly.  Scope: compression 1 (none),
32773 (PackBits, the spec's §9 byte-run RLE), 5 (TIFF-LZW — the
MSB-FIRST, EARLY-CHANGE variant, deliberately a separate
implementation from GIF's LSB-first coder) and 8 (Deflate — stdlib
zlib); 8- and 16-bit grayscale and RGB(A) (16-bit samples decode in
the file's byte order and downsample by the high byte onto the 8-bit
surface, the decode_png rule), single plane (PlanarConfiguration 1),
strips (tiled TIFF is an extension and fails fast).  JPEG-in-TIFF and
CCITT fax codings fail fast naming themselves.

``encode_tiff`` is the fixture/export twin (uncompressed or PackBits,
gray/RGB, configurable rows-per-strip so multi-strip assembly is
exercised); round-trips are exact by construction.
"""

from __future__ import annotations

import struct

import numpy as np

# baseline tag ids
_WIDTH, _HEIGHT, _BITS, _COMPRESSION, _PHOTOMETRIC = 256, 257, 258, 259, 262
_STRIP_OFFSETS, _SAMPLES, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_PLANAR = 284

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _packbits_decode(data: bytes, expect: int) -> bytes:
    """PackBits (TIFF §9): n in 0..127 -> copy n+1 literal bytes;
    n in -127..-1 -> repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            if i + n + 1 > len(data):
                raise ValueError("TIFF PackBits literal run truncated")
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("TIFF PackBits repeat run truncated")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expect:
        raise ValueError(f"TIFF PackBits yielded {len(out)} of {expect} bytes")
    return bytes(out[:expect])


def _packbits_encode(row: bytes) -> bytes:
    """Per-row PackBits writer: greedy runs of >= 3 repeats, literals
    otherwise (the spec's recommended row-at-a-time discipline)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and (n - i < 3 or not (row[i] == row[i + 1] == row[i + 2])):
            i += 1
            if i - lit_start == 128:
                break
        out += bytes([i - lit_start - 1]) + row[lit_start:i]
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF-LZW (spec §13): 8-bit symbols, codes packed MSB-FIRST,
    CLEAR=256 / EOI=257, and the EARLY-CHANGE rule — the code width
    grows one code EARLIER than GIF's coder (when next_code + 1 would
    overflow the width), the detail that makes the two bitstreams
    incompatible."""
    CLEAR, EOI = 256, 257
    table: dict[int, bytes] = {}
    next_code = 258
    width = 9
    out = bytearray()
    prev: bytes | None = None
    acc = bits = 0
    i = 0
    while True:
        while bits < width:
            if i >= len(data):
                if len(out) >= expect:
                    return bytes(out[:expect])
                raise ValueError("TIFF LZW stream truncated")
            acc = (acc << 8) | data[i]
            bits += 8
            i += 1
        code = (acc >> (bits - width)) & ((1 << width) - 1)
        bits -= width
        if code == CLEAR:
            table = {}
            next_code = 258
            width = 9
            prev = None
            continue
        if code == EOI:
            if len(out) < expect:
                raise ValueError(
                    f"TIFF LZW EOI after {len(out)} of {expect} bytes"
                )
            return bytes(out[:expect])
        if code < 256:
            entry = bytes([code])
        elif code in table:
            entry = table[code]
        elif prev is not None and code == next_code:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError(f"TIFF LZW code {code} ahead of dictionary")
        out += entry
        if prev is not None and next_code <= 4095:
            table[next_code] = prev + entry[:1]
            next_code += 1
        # EARLY CHANGE, decode side: the decoder's definitions lag the
        # encoder's by one code, so it widens one define EARLIER
        # (libtiff's dec maxcode = 2^w - 2 vs enc maxcode = 2^w - 1)
        if next_code + 1 >= (1 << width) and width < 12:
            width += 1
        prev = entry
        if len(out) > expect:
            raise ValueError(
                f"TIFF LZW produced {len(out)} bytes for {expect}"
            )


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-LZW writer (MSB-first, early-change) — the decoder's
    fixture twin, dictionary-building so growth paths are real."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = bits = 0
    width = 9

    def emit(code: int):
        nonlocal acc, bits
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8

    table: dict[bytes, int] = {}
    next_code = 258
    emit(CLEAR)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if len(cand) == 1 or cand in table:
            run = cand
            continue
        emit(run[0] if len(run) == 1 else table[run])
        if next_code <= 4095:
            table[cand] = next_code
            next_code += 1
            if next_code + 1 > (1 << width) and width < 12:
                width += 1
        else:
            emit(CLEAR)
            table = {}
            next_code = 258
            width = 9
        run = bytes([b])
    if run:
        emit(run[0] if len(run) == 1 else table[run])
    emit(EOI)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def decode_tiff(payload: bytes) -> dict:
    """First IFD of a TIFF payload -> 8-bit samples:
    ``{format, width, height, channels, pixels}`` (the decode_png
    contract; RGBA keeps channels=4)."""
    if not isinstance(payload, (bytes, bytearray)) or len(payload) < 8:
        raise ValueError("not a TIFF payload")
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF payload (no II*/MM* magic)")
    (ifd_at,) = struct.unpack(e + "I", payload[4:8])
    if ifd_at + 2 > len(payload):
        raise ValueError("TIFF IFD offset past payload")
    (n_tags,) = struct.unpack(e + "H", payload[ifd_at:ifd_at + 2])
    tags: dict[int, list[int]] = {}
    for t in range(n_tags):
        at = ifd_at + 2 + 12 * t
        if at + 12 > len(payload):
            raise ValueError("TIFF IFD truncated")
        tag, typ, count = struct.unpack(e + "HHI", payload[at:at + 8])
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue  # unknown field type: skip per spec
        total = size * count
        val_at = at + 8
        if total > 4:
            (val_at,) = struct.unpack(e + "I", payload[at + 8:at + 12])
        raw = payload[val_at:val_at + total]
        if len(raw) < total:
            raise ValueError(f"TIFF tag {tag} data truncated")
        fmt = {1: "B", 3: "H", 4: "I"}.get(typ)
        if fmt:
            tags[tag] = list(struct.unpack(e + fmt * count, raw))
    if _WIDTH not in tags or _HEIGHT not in tags:
        raise ValueError("TIFF missing ImageWidth/ImageLength")
    w, h = tags[_WIDTH][0], tags[_HEIGHT][0]
    comp = tags.get(_COMPRESSION, [1])[0]
    if comp not in (1, 5, 8, 32773):
        names = {6: "old-JPEG", 7: "JPEG", 2: "CCITT-G3",
                 3: "CCITT-G3", 4: "CCITT-G4"}
        raise NotImplementedError(
            f"TIFF compression {comp} ({names.get(comp, 'unknown')}): "
            "none/PackBits/LZW/Deflate decode here — entropy-coded "
            "image payloads inside TIFF need the named codec"
        )
    spp = tags.get(_SAMPLES, [1])[0]
    bits = tags.get(_BITS, [8] * spp)
    if not (all(b == 8 for b in bits) or all(b == 16 for b in bits)):
        raise NotImplementedError(
            f"TIFF BitsPerSample {bits}: uniform 8- or 16-bit only"
        )
    bps = bits[0] // 8  # bytes per sample: 1 or 2
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"TIFF SamplesPerPixel {spp} (1/3/4)")
    if tags.get(_PLANAR, [1])[0] != 1:
        raise NotImplementedError("TIFF planar configuration 2 (separate planes)")
    offsets = tags.get(_STRIP_OFFSETS)
    counts = tags.get(_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF strips missing/mismatched")
    rps = tags.get(_ROWS_PER_STRIP, [h])[0]
    row_bytes = w * spp * bps
    data = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        raw = payload[off:off + cnt]
        if len(raw) < cnt:
            raise ValueError(f"TIFF strip {si} truncated")
        rows_here = min(rps, h - si * rps)
        if rows_here <= 0:
            raise ValueError("TIFF more strips than rows")
        expect = rows_here * row_bytes
        if comp == 1:
            data += raw
        elif comp == 32773:
            data += _packbits_decode(raw, expect)
        elif comp == 5:
            data += _tiff_lzw_decode(raw, expect)
        else:  # comp == 8: Deflate
            import zlib

            inflated = zlib.decompress(bytes(raw))
            # clamp+validate per strip like PackBits/LZW: an over-long
            # inflate must not silently shift every subsequent row
            if len(inflated) < expect:
                raise ValueError(
                    f"TIFF Deflate strip {si}: {len(inflated)} bytes, "
                    f"need {expect}"
                )
            data += inflated[:expect]
    if len(data) < h * row_bytes:
        raise ValueError(
            f"TIFF strips carry {len(data)} bytes, need {h * row_bytes}"
        )
    if bps == 2:
        # native 16-bit samples in the FILE's byte order; downsample by
        # the high byte onto the 8-bit surface — the same 16->8 rule
        # decode_png applies (exact for the hi*257 gradients 16-bit
        # encoders emit for 8-bit content)
        wide = np.frombuffer(bytes(data[: h * row_bytes]), dtype=np.dtype(e + "u2"))
        px = (wide >> 8).astype(np.uint8).reshape(h, w, spp)
    else:
        px = np.frombuffer(bytes(data[: h * row_bytes]), dtype=np.uint8).reshape(
            h, w, spp
        )
    photo = tags.get(_PHOTOMETRIC, [1])[0]
    if photo == 0 and spp == 1:  # WhiteIsZero: invert into the contract
        px = 255 - px
    return {
        "format": "tiff", "width": int(w), "height": int(h),
        "channels": int(spp), "pixels": np.ascontiguousarray(px).tobytes(),
    }


def encode_tiff(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    rows_per_strip: int | None = None,
    packbits: bool = False,
    compression: int | None = None,
    bits_per_sample: int = 8,
) -> bytes:
    """Little-endian baseline TIFF writer (fixture/export twin):
    gray/RGB/RGBA 8- or 16-bit (``bits_per_sample=16`` takes
    little-endian uint16 sample bytes), strip layout with configurable
    rows-per-strip (multi-strip assembly is part of what the tests
    exercise), compression 1/5/8/32773 (``packbits=True`` is shorthand
    for 32773)."""
    if channels not in (1, 3, 4):
        raise ValueError(f"channels={channels} (1/3/4)")
    if bits_per_sample not in (8, 16):
        raise ValueError(f"bits_per_sample={bits_per_sample} (8/16)")
    bps = bits_per_sample // 8
    if len(pixels) != width * height * channels * bps:
        raise ValueError(
            f"need {width * height * channels * bps} bytes, got {len(pixels)}"
        )
    comp = compression if compression is not None else (32773 if packbits else 1)
    if comp not in (1, 5, 8, 32773):
        raise ValueError(f"compression={comp} (1/5/8/32773)")
    rps = rows_per_strip or height
    row_bytes = width * channels * bps
    strips = []
    for y0 in range(0, height, rps):
        rows = pixels[y0 * row_bytes:(y0 + min(rps, height - y0)) * row_bytes]
        if comp == 32773:
            body = b"".join(
                _packbits_encode(rows[r * row_bytes:(r + 1) * row_bytes])
                for r in range(len(rows) // row_bytes)
            )
        elif comp == 5:
            body = _tiff_lzw_encode(rows)
        elif comp == 8:
            import zlib

            body = zlib.compress(rows)
        else:
            body = rows
        strips.append(body)

    def tag(tid, typ, vals):
        count = len(vals)
        size = _TYPE_SIZE[typ] * count
        fmt = {3: "H", 4: "I"}[typ]
        packed = struct.pack("<" + fmt * count, *vals)
        if size <= 4:
            return struct.pack("<HHI", tid, typ, count) + packed.ljust(4, b"\x00"), b""
        return None, packed  # needs out-of-line storage; resolved below

    entries = [
        (_WIDTH, 4, [width]),
        (_HEIGHT, 4, [height]),
        (_BITS, 3, [bits_per_sample] * channels),
        (_COMPRESSION, 3, [comp]),
        (_PHOTOMETRIC, 3, [1 if channels == 1 else 2]),
        (_STRIP_OFFSETS, 4, [0] * len(strips)),  # patched below
        (_SAMPLES, 3, [channels]),
        (_ROWS_PER_STRIP, 4, [rps]),
        (_STRIP_COUNTS, 4, [len(s) for s in strips]),
    ]
    header = struct.pack("<4sI", b"II*\x00", 8)
    ifd_at = 8
    n = len(entries)
    ifd_size = 2 + 12 * n + 4
    extra_at = ifd_at + ifd_size
    # lay out out-of-line tag data, then strips
    extra = bytearray()
    strip_offsets: list[int] = []
    # first pass to size out-of-line data (strip offsets need the total)
    def oversize(typ, vals):
        return _TYPE_SIZE[typ] * len(vals) > 4

    for tid, typ, vals in entries:
        if oversize(typ, vals):
            extra += struct.pack("<" + {3: "H", 4: "I"}[typ] * len(vals), *vals)
    data_at = extra_at + len(extra)
    at = data_at
    for s in strips:
        strip_offsets.append(at)
        at += len(s)
    # rebuild with real strip offsets
    entries[5] = (_STRIP_OFFSETS, 4, strip_offsets)
    out = bytearray(header)
    out += struct.pack("<H", n)
    extra = bytearray()
    cursor = extra_at
    for tid, typ, vals in entries:
        count = len(vals)
        fmt = {3: "H", 4: "I"}[typ]
        packed = struct.pack("<" + fmt * count, *vals)
        if len(packed) <= 4:
            out += struct.pack("<HHI", tid, typ, count) + packed.ljust(4, b"\x00")
        else:
            out += struct.pack("<HHII", tid, typ, count, cursor)
            extra += packed
            cursor += len(packed)
    out += struct.pack("<I", 0)  # next-IFD pointer: none
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def tiff_dims(payload: bytes) -> tuple[int | None, int | None]:
    """(width, height) from the first IFD's tags alone — no strip
    reads, the header-sniffing cost contract.  (None, None) for
    malformed payloads (classify, never throw)."""
    try:
        if payload[:4] == b"II*\x00":
            e = "<"
        elif payload[:4] == b"MM\x00*":
            e = ">"
        else:
            return (None, None)
        (ifd_at,) = struct.unpack(e + "I", payload[4:8])
        (n_tags,) = struct.unpack(e + "H", payload[ifd_at:ifd_at + 2])
        w = h = None
        for t in range(n_tags):
            at = ifd_at + 2 + 12 * t
            tag, typ, count = struct.unpack(e + "HHI", payload[at:at + 8])
            if tag in (_WIDTH, _HEIGHT) and count == 1 and typ in (3, 4):
                (v,) = struct.unpack(
                    e + ("H" if typ == 3 else "I"),
                    payload[at + 8:at + (10 if typ == 3 else 12)],
                )
                if tag == _WIDTH:
                    w = int(v)
                else:
                    h = int(v)
        return (w, h)
    except Exception:  # noqa: BLE001 — sniffing must not throw
        return (None, None)
