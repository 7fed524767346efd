"""Baseline TIFF decode (TIFF 6.0, the public Adobe spec) — the
document/scan-crawl format: II/MM endianness, IFD tag walk, strip
assembly.  Scope: compression 1 (none),
32773 (PackBits, the spec's §9 byte-run RLE), 5 (TIFF-LZW — the
MSB-FIRST, EARLY-CHANGE variant, deliberately a separate
implementation from GIF's LSB-first coder) and 8 (Deflate — stdlib
zlib); 8- and 16-bit grayscale and RGB(A) (16-bit samples decode in
the file's byte order and downsample by the high byte onto the 8-bit
surface, the decode_png rule), chunky AND separate-plane layouts
(PlanarConfiguration 1/2 — round 17), STRIP and TILE layouts (tags
322-325, edge tiles cropped per spec — round 17), and Predictor 2
(horizontal differencing, the common LZW companion; previously the
tag was not read, which would have decoded a predictor-2 payload to
silently wrong pixels — round 17), and NEW-STYLE JPEG (compression
7) with the JPEGTables abbreviated-stream splice, delegated to the
in-repo ``operators.jpeg`` decoder (round 17).  Old-style JPEG
(compression 6), CCITT fax codings and the floating-point predictor
fail fast naming themselves.

``encode_tiff`` is the fixture/export twin (compression 1/5/7/8/32773,
gray/RGB(A), configurable rows-per-strip, optional tile/planar-2/
predictor-2 layouts so every assembly path is exercised);
round-trips are exact by construction.
"""

from __future__ import annotations

import struct

import numpy as np

# baseline tag ids
_WIDTH, _HEIGHT, _BITS, _COMPRESSION, _PHOTOMETRIC = 256, 257, 258, 259, 262
_STRIP_OFFSETS, _SAMPLES, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_PLANAR, _PREDICTOR, _JPEG_TABLES = 284, 317, 347
_TILE_W, _TILE_L, _TILE_OFFSETS, _TILE_COUNTS = 322, 323, 324, 325

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}  # BYTE ASCII SHORT LONG RATIONAL UNDEFINED


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
        fmt = {1: "B", 3: "H", 4: "I", 7: "B"}.get(typ)
        if fmt:
            tags[tag] = list(struct.unpack(e + fmt * count, raw))
    if _WIDTH not in tags or _HEIGHT not in tags:
        raise ValueError("TIFF missing ImageWidth/ImageLength")
    w, h = tags[_WIDTH][0], tags[_HEIGHT][0]
    comp = tags.get(_COMPRESSION, [1])[0]
    if comp not in (1, 5, 8, 32773, 7):
        names = {6: "old-JPEG", 2: "CCITT-G3",
                 3: "CCITT-G3", 4: "CCITT-G4"}
        raise NotImplementedError(
            f"TIFF compression {comp} ({names.get(comp, 'unknown')}): "
            "none/PackBits/LZW/Deflate/new-style-JPEG decode here — "
            "old-JPEG and CCITT fax codings need the named codec"
        )
    # new-style JPEG (comp 7): the optional JPEGTables tag carries an
    # abbreviated table-specification stream (SOI..EOI) whose tables
    # splice in after each chunk's SOI
    jpeg_tables = b""
    if comp == 7 and _JPEG_TABLES in tags:
        jt = bytes(tags[_JPEG_TABLES])
        if len(jt) >= 4 and jt[:2] == b"\xff\xd8" and jt[-2:] == b"\xff\xd9":
            jpeg_tables = jt[2:-2]
        else:
            raise ValueError("TIFF JPEGTables is not an SOI..EOI stream")
    spp = tags.get(_SAMPLES, [1])[0]
    bits = tags.get(_BITS, [8] * spp)
    if not (all(b == 8 for b in bits) or all(b == 16 for b in bits)):
        raise NotImplementedError(
            f"TIFF BitsPerSample {bits}: uniform 8- or 16-bit only"
        )
    bps = bits[0] // 8  # bytes per sample: 1 or 2
    if spp not in (1, 3, 4):
        raise NotImplementedError(f"TIFF SamplesPerPixel {spp} (1/3/4)")
    planar = tags.get(_PLANAR, [1])[0]
    if planar not in (1, 2):
        raise ValueError(f"TIFF PlanarConfiguration {planar} (1/2)")
    predictor = tags.get(_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF Predictor {predictor}: none (1) and horizontal "
            "differencing (2) decode here; 3 (floating point) doesn't"
        )
    n_planes = spp if planar == 2 else 1
    chunk_ch = 1 if planar == 2 else spp
    file_dt = np.uint8 if bps == 1 else np.dtype(e + "u2")

    def _chunk_arr(raw: bytes, rows: int, cols: int, idx: int) -> "np.ndarray":
        """One strip/tile -> (rows, cols, chunk_ch) array: decompress,
        clamp to the expected byte count, undo Predictor 2 (each row
        restarts, per the spec — differencing never crosses a strip or
        tile boundary because each chunk compresses independently)."""
        expect = rows * cols * chunk_ch * bps
        if comp == 1:
            if len(raw) < expect:
                raise ValueError(
                    f"TIFF chunk {idx}: {len(raw)} bytes, need {expect}"
                )
            buf = raw[:expect]
        elif comp == 7:
            # each chunk is a complete JPEG stream (tables possibly
            # factored out into the JPEGTables tag); predictor never
            # applies to JPEG chunks
            stream = bytes(raw)
            if stream[:2] != b"\xff\xd8":
                raise ValueError(f"TIFF JPEG chunk {idx} has no SOI")
            if jpeg_tables:
                stream = stream[:2] + jpeg_tables + stream[2:]
            from .jpeg import decode_jpeg

            img = decode_jpeg(stream)
            if (img["width"], img["height"]) != (cols, rows) or img["channels"] != chunk_ch:
                raise ValueError(
                    f"TIFF JPEG chunk {idx} decodes to "
                    f"{img['width']}x{img['height']}x{img['channels']}, "
                    f"geometry needs {cols}x{rows}x{chunk_ch}"
                )
            return np.frombuffer(img["pixels"], dtype=np.uint8).reshape(
                rows, cols, chunk_ch
            )
        elif comp == 32773:
            buf = _packbits_decode(raw, expect)
        elif comp == 5:
            buf = _tiff_lzw_decode(raw, expect)
        else:  # comp == 8: Deflate
            import zlib

            inflated = zlib.decompress(bytes(raw))
            # clamp+validate like PackBits/LZW: an over-long inflate
            # must not silently shift every subsequent row
            if len(inflated) < expect:
                raise ValueError(
                    f"TIFF Deflate chunk {idx}: {len(inflated)} bytes, "
                    f"need {expect}"
                )
            buf = inflated[:expect]
        arr = np.frombuffer(bytes(buf), dtype=file_dt).reshape(rows, cols, chunk_ch)
        if predictor == 2:
            mask = 0xFF if bps == 1 else 0xFFFF
            arr = (np.cumsum(arr, axis=1, dtype=np.uint32) & mask).astype(
                np.uint8 if bps == 1 else np.uint16
            )
        return arr

    out = np.zeros((h, w, spp), dtype=np.uint8 if bps == 1 else np.uint16)
    if _TILE_OFFSETS in tags or _TILE_W in tags:
        tw = tags.get(_TILE_W, [0])[0]
        tl = tags.get(_TILE_L, [0])[0]
        offsets = tags.get(_TILE_OFFSETS)
        counts = tags.get(_TILE_COUNTS)
        if not tw or not tl or not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF tile tags missing/mismatched")
        across, down = -(-w // tw), -(-h // tl)
        per_plane = across * down
        if len(offsets) != per_plane * n_planes:
            raise ValueError(
                f"TIFF has {len(offsets)} tiles, geometry needs "
                f"{per_plane * n_planes}"
            )
        for idx, (off, cnt) in enumerate(zip(offsets, counts)):
            raw = payload[off:off + cnt]
            if len(raw) < cnt:
                raise ValueError(f"TIFF tile {idx} truncated")
            plane, t = divmod(idx, per_plane)
            ty, tx = divmod(t, across)
            arr = _chunk_arr(raw, tl, tw, idx)
            rr = min(tl, h - ty * tl)
            cc = min(tw, w - tx * tw)
            if planar == 2:
                out[ty * tl:ty * tl + rr, tx * tw:tx * tw + cc, plane] = arr[:rr, :cc, 0]
            else:
                out[ty * tl:ty * tl + rr, tx * tw:tx * tw + cc, :] = arr[:rr, :cc, :]
    else:
        offsets = tags.get(_STRIP_OFFSETS)
        counts = tags.get(_STRIP_COUNTS)
        if not offsets or not counts or len(offsets) != len(counts):
            raise ValueError("TIFF strips missing/mismatched")
        rps = tags.get(_ROWS_PER_STRIP, [h])[0]
        per_plane = -(-h // rps)
        if len(offsets) != per_plane * n_planes:
            raise ValueError(
                f"TIFF has {len(offsets)} strips, geometry needs "
                f"{per_plane * n_planes}"
            )
        for idx, (off, cnt) in enumerate(zip(offsets, counts)):
            raw = payload[off:off + cnt]
            if len(raw) < cnt:
                raise ValueError(f"TIFF strip {idx} truncated")
            plane, si = divmod(idx, per_plane)
            rows_here = min(rps, h - si * rps)
            if rows_here <= 0:
                raise ValueError("TIFF more strips than rows")
            arr = _chunk_arr(raw, rows_here, w, idx)
            y0 = si * rps
            if planar == 2:
                out[y0:y0 + rows_here, :, plane] = arr[:, :, 0]
            else:
                out[y0:y0 + rows_here, :, :] = arr
    if bps == 2:
        # downsample by the high byte onto the 8-bit surface — the
        # same 16->8 rule decode_png applies (exact for the hi*257
        # gradients 16-bit encoders emit for 8-bit content)
        px = (out >> 8).astype(np.uint8)
    else:
        px = out
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
    tile: tuple[int, int] | None = None,
    planar: int = 1,
    predictor: int = 1,
    jpeg_tables: bool = False,
) -> bytes:
    """Little-endian baseline TIFF writer (fixture/export twin):
    gray/RGB/RGBA 8- or 16-bit (``bits_per_sample=16`` takes
    little-endian uint16 sample bytes), strip layout with configurable
    rows-per-strip OR tile layout (``tile=(tw, tl)``, edge tiles
    zero-padded per spec), chunky or separate-plane
    (``planar=2``) sample organization, optional horizontal
    differencing (``predictor=2``), compression 1/5/8/32773
    (``packbits=True`` is shorthand for 32773)."""
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
    if comp not in (1, 5, 8, 32773, 7):
        raise ValueError(f"compression={comp} (1/5/8/32773/7)")
    if comp == 7 and (predictor != 1 or bits_per_sample != 8):
        raise ValueError("JPEG chunks take predictor=1, 8-bit samples")
    if planar not in (1, 2):
        raise ValueError(f"planar={planar} (1/2)")
    if predictor not in (1, 2):
        raise ValueError(f"predictor={predictor} (1/2)")
    sample_dt = np.uint8 if bps == 1 else np.dtype("<u2")
    full = np.frombuffer(pixels, dtype=sample_dt).reshape(height, width, channels)

    def chunk_body(sub: "np.ndarray") -> bytes:
        """Serialize one strip/tile array (rows, cols, ch) with the
        predictor applied then the chosen compression."""
        if predictor == 2:
            mask = 0xFF if bps == 1 else 0xFFFF
            d = sub.astype(np.int64)
            d[:, 1:, :] = d[:, 1:, :] - sub.astype(np.int64)[:, :-1, :]
            sub = (d & mask).astype(sample_dt)
        raw = np.ascontiguousarray(sub).tobytes()
        if comp == 32773:
            rb = sub.shape[1] * sub.shape[2] * bps
            return b"".join(
                _packbits_encode(raw[r * rb:(r + 1) * rb])
                for r in range(sub.shape[0])
            )
        if comp == 5:
            return _tiff_lzw_encode(raw)
        if comp == 7:
            from .jpeg import encode_jpeg

            return encode_jpeg(
                sub.shape[1], sub.shape[0], sub.shape[2], raw, quant=1
            )
        if comp == 8:
            import zlib

            return zlib.compress(raw)
        return raw

    chunks: list[bytes] = []
    planes = range(channels) if planar == 2 else [None]
    if tile is not None:
        tw, tl = tile
        if tw < 1 or tl < 1:
            raise ValueError(f"tile={tile} needs positive dims")
        across, down = -(-width // tw), -(-height // tl)
        for plane in planes:
            for ty in range(down):
                for tx in range(across):
                    sub = full[ty * tl:(ty + 1) * tl, tx * tw:(tx + 1) * tw]
                    sub = sub[:, :, plane:plane + 1] if plane is not None else sub
                    # pad edge tiles to full tile size, per spec
                    padded = np.zeros((tl, tw, sub.shape[2]), dtype=sample_dt)
                    padded[: sub.shape[0], : sub.shape[1]] = sub
                    chunks.append(chunk_body(padded))
        layout = [
            (_TILE_W, 4, [tw]),
            (_TILE_L, 4, [tl]),
            (_TILE_OFFSETS, 4, [0] * len(chunks)),  # patched below
            (_TILE_COUNTS, 4, [0]),                 # patched below
        ]
        offsets_tag = _TILE_OFFSETS
    else:
        rps = rows_per_strip or height
        for plane in planes:
            for y0 in range(0, height, rps):
                sub = full[y0:y0 + rps]
                sub = sub[:, :, plane:plane + 1] if plane is not None else sub
                chunks.append(chunk_body(sub))
        layout = [
            (_STRIP_OFFSETS, 4, [0] * len(chunks)),  # patched below
            (_ROWS_PER_STRIP, 4, [rps]),
            (_STRIP_COUNTS, 4, [0]),                 # patched below
        ]
        offsets_tag = _STRIP_OFFSETS

    tables_tag: list[tuple] = []
    if jpeg_tables:
        if comp != 7:
            raise ValueError("jpeg_tables=True needs compression=7")
        # factor the (identical) DQT/DHT segments out of every chunk
        # into one abbreviated SOI..EOI stream in the JPEGTables tag
        tables = b""
        stripped = []
        for c in chunks:
            out_c = bytearray(c[:2])
            own = bytearray()
            i = 2
            while i + 4 <= len(c):
                if c[i] != 0xFF:
                    out_c += c[i:]
                    break
                marker = c[i + 1]
                if marker == 0xDA:  # SOS: entropy data to EOI follows
                    out_c += c[i:]
                    break
                (seg_len,) = struct.unpack(">H", c[i + 2:i + 4])
                seg = c[i:i + 2 + seg_len]
                if marker in (0xDB, 0xC4):
                    own += seg
                else:
                    out_c += seg
                i += 2 + seg_len
            if not tables:
                tables = bytes(own)
            elif bytes(own) != tables:
                # the in-repo encoder derives Huffman tables from the
                # chunk's own content, so a shared JPEGTables stream is
                # only valid when every chunk produced the same tables
                raise ValueError(
                    "jpeg_tables=True needs identical per-chunk tables "
                    "(feed chunks with identical content, or skip factoring)"
                )
            stripped.append(bytes(out_c))
        chunks = stripped
        jt = b"\xff\xd8" + bytes(tables) + b"\xff\xd9"
        tables_tag = [(_JPEG_TABLES, 7, list(jt))]
    entries = [
        (_WIDTH, 4, [width]),
        (_HEIGHT, 4, [height]),
        (_BITS, 3, [bits_per_sample] * channels),
        (_COMPRESSION, 3, [comp]),
        (_PHOTOMETRIC, 3, [1 if channels == 1 else 2]),
        (_SAMPLES, 3, [channels]),
        *layout,
        *tables_tag,
    ]
    if planar == 2:
        entries.append((_PLANAR, 3, [2]))
    if predictor == 2:
        entries.append((_PREDICTOR, 3, [2]))
    entries.sort(key=lambda t: t[0])  # IFD entries must be tag-ordered
    # patch the real byte counts now that chunks exist
    entries = [
        (tid, typ,
         [len(c) for c in chunks] if tid in (_STRIP_COUNTS, _TILE_COUNTS)
         else vals)
        for tid, typ, vals in entries
    ]
    strips = chunks
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
            extra += struct.pack("<" + {3: "H", 4: "I", 7: "B"}[typ] * len(vals), *vals)
    data_at = extra_at + len(extra)
    at = data_at
    for s in strips:
        strip_offsets.append(at)
        at += len(s)
    # rebuild with real chunk offsets
    entries = [
        (tid, typ, strip_offsets if tid == offsets_tag else vals)
        for tid, typ, vals in entries
    ]
    out = bytearray(header)
    out += struct.pack("<H", n)
    extra = bytearray()
    cursor = extra_at
    for tid, typ, vals in entries:
        count = len(vals)
        fmt = {3: "H", 4: "I", 7: "B"}[typ]
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
