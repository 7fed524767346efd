"""Pure-stdlib+numpy GIF codec (GIF87a/89a, the public CompuServe
spec): logical-screen + color-table parsing, the GIF flavor of LZW
(variable code width 3-12 bits, LSB-first packing, CLEAR/EOI codes,
dictionary rebuild on CLEAR), interlace de-weaving, and a real LZW
fixture encoder twin (dictionary-building, so the decoder's growth
and code-width-increase paths are actually exercised — an
"uncompressed GIF" encoder that clears every block would leave them
untested).

Scope: the FIRST image frame decodes to RGB via its (local or global)
color table — the training-data contract is one image per payload;
animation frames, transparency compositing and disposal methods are a
player's job, and a multi-frame payload decodes as its first frame
(documented, not guessed).  Errors follow the codec-module contract:
ValueError for malformed/truncated payloads, NotImplementedError
never (everything in a legal static GIF decodes).
"""

from __future__ import annotations

import struct

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    """GIF-LZW: codes packed LSB-first at a width that grows with the
    dictionary (min+1 .. 12 bits); CLEAR resets the dictionary, EOI
    ends the stream.  Returns exactly ``n_pixels`` indices (spec-legal
    streams may omit EOI; extra pixels past n are an error)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"GIF LZW min code size {min_code_size} (2-8)")
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return {i: (i,) for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple | None = None
    acc = bits = 0
    i = 0
    while True:
        while bits < width:
            if i >= len(data):
                if len(out) >= n_pixels:
                    return out[:n_pixels]
                raise ValueError("GIF LZW stream truncated")
            acc |= data[i] << bits
            bits += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            if len(out) < n_pixels:
                raise ValueError(
                    f"GIF EOI after {len(out)} of {n_pixels} pixels"
                )
            return out[:n_pixels]
        if prev is None:
            if code >= clear:
                raise ValueError(f"GIF LZW first code {code} not a literal")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW code {code} ahead of dictionary")
        out.extend(entry)
        if prev is not None and next_code <= 0xFFF:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > n_pixels:
            raise ValueError(
                f"GIF LZW produced {len(out)} pixels for a {n_pixels}-pixel image"
            )


def _deinterlace(rows: "np.ndarray") -> "np.ndarray":
    """GIF 4-pass interlace: rows appear in passes starting 0/4/2/1
    with strides 8/8/4/2 — invert the weave."""
    h = rows.shape[0]
    order = (list(range(0, h, 8)) + list(range(4, h, 8))
             + list(range(2, h, 4)) + list(range(1, h, 2)))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(payload: bytes) -> dict:
    """First frame of a GIF payload -> RGB: ``{format, width, height,
    channels, pixels}`` (the decode_png contract).  Width/height are
    the FRAME's (GIFs may place a smaller frame on a larger logical
    screen; for a single-image GIF they coincide)."""
    if not isinstance(payload, (bytes, bytearray)) or payload[:6] not in (
        b"GIF87a", b"GIF89a"
    ):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("GIF header truncated")
    _sw, _sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[i:i + 3 * n], dtype=np.uint8).reshape(n, 3)
        if gct.shape[0] != n:
            raise ValueError("GIF global color table truncated")
        i += 3 * n
    while i < len(payload):
        b = payload[i]
        if b == 0x21:  # extension: label + sub-blocks, all skippable
            i += 2
            while i < len(payload) and payload[i] != 0:
                i += 1 + payload[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            if i + 10 > len(payload):
                raise ValueError("GIF image descriptor truncated")
            _lx, _ty, w, h, iflags = struct.unpack("<HHHHB", payload[i + 1:i + 10])
            i += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                ct = np.frombuffer(
                    payload[i:i + 3 * n], dtype=np.uint8
                ).reshape(-1, 3)
                if ct.shape[0] != n:
                    raise ValueError("GIF local color table truncated")
                i += 3 * n
            if ct is None:
                raise ValueError("GIF frame with no color table")
            if w == 0 or h == 0:
                raise ValueError(f"GIF frame {w}x{h}")
            if i >= len(payload):
                raise ValueError("GIF LZW header truncated")
            min_code = payload[i]
            i += 1
            data = bytearray()
            while i < len(payload) and payload[i] != 0:
                n = payload[i]
                data += payload[i + 1:i + 1 + n]
                if len(payload) < i + 1 + n:
                    raise ValueError("GIF data sub-block truncated")
                i += 1 + n
            idx = np.array(
                _lzw_decode(min_code, bytes(data), w * h), dtype=np.int64
            ).reshape(h, w)
            if int(idx.max()) >= ct.shape[0]:
                raise ValueError(
                    f"GIF pixel index {int(idx.max())} outside the "
                    f"{ct.shape[0]}-entry color table"
                )
            if iflags & 0x40:
                idx = _deinterlace(idx)
            rgb = ct[idx]
            return {
                "format": "gif", "width": int(w), "height": int(h),
                "channels": 3,
                "pixels": np.ascontiguousarray(rgb).astype(np.uint8).tobytes(),
            }
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"GIF unknown block 0x{b:02x} at {i}")
    raise ValueError("GIF with no image frame")


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """Real dictionary-building GIF-LZW encoder (greedy longest-match,
    CLEAR emitted at start and on dictionary overflow) — exercises the
    decoder's growth, width-increase and KwKwK paths."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = bits = 0
    width = min_code_size + 1

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    table: dict = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    run: tuple = ()
    for px in indices:
        cand = run + (px,)
        if cand in table:
            run = cand
            continue
        emit(table[run])
        if next_code <= 0xFFF:
            table[cand] = next_code
            # the decoder widens when next_code REACHES 1<<width; the
            # encoder must widen at the same boundary to stay in sync
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = (px,)
    if run:
        emit(table[run])
    emit(eoi)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    pixels: bytes,
    interlace: bool = False,
) -> bytes:
    """Single-frame GIF89a fixture encoder: palette built from the
    image's distinct colors (<= 256 required — GIF is an indexed
    format; quantization is out of scope for a fixture twin), real
    dictionary-building LZW, optional interlace weave.  Round-trips
    bit-exactly through ``decode_gif``."""
    rgb = np.frombuffer(bytes(pixels), dtype=np.uint8)
    if rgb.size != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {rgb.size}")
    rgb = rgb.reshape(height, width, 3)
    colors, inverse = np.unique(
        rgb.reshape(-1, 3), axis=0, return_inverse=True
    )
    if colors.shape[0] > 256:
        raise ValueError(
            f"{colors.shape[0]} distinct colors: GIF is indexed (<= 256); "
            "quantize first"
        )
    # color-table size: power of two >= max(2, n); min_code_size >= 2
    n_bits = max(2, int(np.ceil(np.log2(max(colors.shape[0], 2)))))
    table = np.zeros((1 << n_bits, 3), dtype=np.uint8)
    table[: colors.shape[0]] = colors
    idx = inverse.reshape(height, width)
    if interlace:
        h = height
        order = (list(range(0, h, 8)) + list(range(4, h, 8))
                 + list(range(2, h, 4)) + list(range(1, h, 2)))
        idx = idx[order]
    lzw = _lzw_encode(n_bits, [int(v) for v in idx.reshape(-1)])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height,
                       0x80 | (n_bits - 1), 0, 0)
    out += table.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height,
                                 0x40 if interlace else 0)
    out.append(n_bits)
    for at in range(0, len(lzw), 255):
        block = lzw[at:at + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)
