"""Pure-stdlib+numpy baseline JPEG codec (VERDICT r12 #6).

JPEG is the last high-volume crawl image format that was still an
honest fail-fast in ``multimodal.decode_image``; this module decodes
BASELINE sequential JPEG (SOF0: Huffman entropy coding, 8-bit
samples, interleaved scan, optional restart intervals, any integer
chroma subsampling — 4:4:4 and 4:2:0 are the ones that occur in
practice) with no codec library, the ``decode_png`` discipline.
Progressive (SOF2), arithmetic-coded, hierarchical, and 12-bit
variants stay explicit ``NotImplementedError`` fail-fasts.

``encode_jpeg`` is the fixture/export twin: a minimal baseline
encoder (flat quantization by default, per-image canonical Huffman
tables, optional 4:2:0 and restart intervals) that emits spec-valid
files — it exists so tests can round-trip the decoder without any
image library in the container, exactly like ``encode_png``.

Scale note (same as the PNG path): decode runs as the Python side of
an Arrow-batched ``mapInPandas`` — one batch per partition, payloads
never shuffled — so the 100 TB shape is set by the batching, not by
this per-image loop.  The 8x8 DCT/IDCT is numpy (one matrix triple
product per block); entropy coding is plain Python over the batch.
"""

from __future__ import annotations

import math

import numpy as np


def _zigzag_order() -> list[int]:
    """Stream position -> raster index, generated (not typed) from the
    spec's diagonal walk: odd anti-diagonals run top-right to
    bottom-left, even ones the reverse."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rng if s % 2 else reversed(rng)):
            out.append(r * 8 + (s - r))
    return out


_ZIGZAG = _zigzag_order()

# DCT-II basis: A[u, x] = 0.5 * c(u) * cos((2x+1) u pi / 16);
# FDCT of block X is A @ X @ A.T, IDCT of coeffs F is A.T @ F @ A
_DCT_A = np.array(
    [
        [
            0.5 * (1.0 / math.sqrt(2.0) if u == 0 else 1.0)
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        for i in reversed(range(bits)):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per the spec


class _BitReader:
    """MSB-first bit reader over already de-stuffed scan bytes."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG scan data exhausted mid-block")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """DHT (BITS, HUFFVAL) -> {(length, code): symbol} per the spec's
    canonical code construction."""
    table: dict = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(rd: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """DC/AC magnitude bits -> signed value (spec's EXTEND)."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline JPEG to row-major 8-bit samples.  Returns
    ``{format, width, height, channels, pixels}`` like ``decode_png``
    (channels 1 for grayscale, 3 for YCbCr color converted to RGB with
    the JFIF coefficients)."""
    if not isinstance(payload, (bytes, bytearray)) or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    comps: list[dict] = []
    w = h = 0
    restart = 0
    scan: list[tuple[int, int, int]] = []  # (comp index, dc id, ac id)
    pos = 2
    sos_at = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before SOS: malformed
            break
        (seglen,) = __import__("struct").unpack(">H", payload[pos + 2:pos + 4])
        seg = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                n = 64 * (2 if pq else 1)
                raw = seg[i:i + n]
                vals = (
                    [v for v in raw] if pq == 0
                    else [int.from_bytes(raw[j:j + 2], "big") for j in range(0, n, 2)]
                )
                t = np.ones((8, 8))
                for k, zz in enumerate(_ZIGZAG):
                    t[zz // 8][zz % 8] = vals[k]
                qt[tq] = t
                i += n
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                huff[(tc, th)] = _canonical_codes(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline ok
            if seg[0] != 8:
                raise NotImplementedError(f"JPEG sample precision {seg[0]} (only 8)")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            for c in range(seg[5]):
                cid, hv, tq = seg[6 + c * 3:9 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential Huffman "
                "(SOF0/SOF1) decodes here — progressive / arithmetic / "
                "hierarchical payloads fail fast"
            )
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            # ADVICE r13: the MCU loop below assumes ONE interleaved
            # scan covering every SOF component.  A spec-legal baseline
            # JPEG may instead ship per-component scans (ns <
            # len(comps)); decoding only the first with interleaved
            # geometry would silently return wrong pixels (zero chroma
            # planes -> neutral color), so fail fast like SOF2 does.
            if ns != len(comps):
                raise NotImplementedError(
                    f"JPEG non-interleaved / multi-scan baseline (SOS has {ns} "
                    f"of {len(comps)} components): only a single interleaved "
                    "scan decodes here"
                )
            for c in range(ns):
                cs, tdta = seg[1 + c * 2:3 + c * 2]
                idx = next(i for i, comp in enumerate(comps) if comp["id"] == cs)
                scan.append((idx, tdta >> 4, tdta & 15))
            sos_at = pos + 2 + seglen
            break
        pos += 2 + seglen
    if sos_at is None or not comps or w == 0 or h == 0:
        raise ValueError("JPEG missing SOF/SOS")

    # de-stuff the entropy stream, splitting at restart markers
    segs: list[bytearray] = [bytearray()]
    i = sos_at
    while i < len(payload):
        b = payload[i]
        if b == 0xFF and i + 1 < len(payload):
            m = payload[i + 1]
            if m == 0x00:
                segs[-1].append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:
                segs.append(bytearray())
                i += 2
                continue
            break  # EOI or next marker
        segs[-1].append(b)
        i += 1

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    ]
    pred = [0] * len(comps)
    rd = _BitReader(bytes(segs[0]))
    seg_i = 0
    for mcu in range(mcux * mcuy):
        if restart and mcu and mcu % restart == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG restart interval set but RST markers missing")
            rd = _BitReader(bytes(segs[seg_i]))
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, dc_id, ac_id in scan:
            comp = comps[ci]
            dct, act = huff[(0, dc_id)], huff[(1, ac_id)]
            q = qt[comp["tq"]]
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    coef = np.zeros(64)
                    s = _huff_decode(rd, dct)
                    pred[ci] += _extend(rd.bits(s), s)
                    coef[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(rd, act)
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        coef[_ZIGZAG[k]] = _extend(rd.bits(s), s)
                        k += 1
                    block = _DCT_A.T @ (coef.reshape(8, 8) * q) @ _DCT_A
                    y0 = (my * comp["v"] + by) * 8
                    x0 = (mx * comp["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = block

    out_planes = []
    for ci, comp in enumerate(comps):
        fy, fx = vmax // comp["v"], hmax // comp["h"]
        if fy * comp["v"] != vmax or fx * comp["h"] != hmax:
            raise NotImplementedError(
                f"JPEG non-integer subsampling ratio {comp['h']}x{comp['v']} "
                f"vs max {hmax}x{vmax}"
            )
        p = planes[ci] + 128.0
        if fy > 1 or fx > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        out_planes.append(p[:h, :w])
    if len(comps) == 1:
        rgb = out_planes[0][:, :, None]
        channels = 1
    elif len(comps) == 3:
        y, cb, cr = out_planes
        rgb = np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=2,
        )
        channels = 3
    else:
        raise NotImplementedError(f"JPEG with {len(comps)} components (CMYK?)")
    pixels = np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()
    return {
        "format": "jpeg", "width": w, "height": h,
        "channels": channels, "pixels": pixels,
    }


def _build_huffman(symbol_sets: list[set]) -> list[tuple[list[int], list[int]]]:
    """One fixed-length canonical code per table: n symbols all at
    length L = bit_length(n), so 2^L > n and the all-ones code stays
    unassigned (the spec's reserved-code rule).  Deliberately
    compression-free — the encoder exists for fixtures, and a trivial
    complete prefix code removes the Annex-K table-transcription risk
    entirely (the decoder reads whatever DHT says)."""
    out = []
    for syms in symbol_sets:
        vals = sorted(syms) if syms else [0]
        n = len(vals)
        length = max(1, n.bit_length())
        bits = [0] * 16
        bits[length - 1] = n
        out.append((bits, vals))
    return out


def _fdct_quant(plane: np.ndarray, q: np.ndarray, y0: int, x0: int) -> list[int]:
    block = plane[y0:y0 + 8, x0:x0 + 8] - 128.0
    coef = np.round((_DCT_A @ block @ _DCT_A.T) / q).astype(int)
    return [int(coef.flat[z]) for z in _ZIGZAG]


def _block_symbols(zz: list[int], pred: int) -> tuple[list, int]:
    """(DC size sym, bits) + AC (run/size sym, bits) stream for one
    quantized zigzag block; returns the tokens and the new DC pred."""
    tokens = []
    diff = zz[0] - pred
    s = abs(diff).bit_length()
    tokens.append(("dc", s, diff if diff >= 0 else diff + (1 << s) - 1))
    run = 0
    last = max((k for k in range(1, 64) if zz[k]), default=0)
    for k in range(1, last + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            tokens.append(("ac", 0xF0, 0))
            run -= 16
        s = abs(zz[k]).bit_length()
        v = zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1
        tokens.append(("ac", (run << 4) | s, v))
        run = 0
    if last < 63:
        tokens.append(("ac", 0x00, 0))
    return tokens, zz[0]


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quant: int = 1,
    subsample_420: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JPEG encoder — ``encode_png``'s lossy sibling.
    ``quant`` is a single flat quantizer step for every coefficient
    (1 = near-lossless up to DCT rounding); ``subsample_420`` emits
    2x2-subsampled chroma (box mean); ``restart_interval`` > 0 emits
    DRI + RSTn markers every that many MCUs.  Huffman tables are
    per-image canonical fixed-length codes (see ``_build_huffman``)."""
    import struct as _struct

    if channels not in (1, 3):
        raise ValueError(f"encode_jpeg writes 1 or 3 channels, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(f"need {width * height * channels} bytes, got {len(pixels)}")
    img = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(
        height, width, channels
    ).astype(float)
    if channels == 3:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        comps_raw = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        hv = [(2, 2), (1, 1), (1, 1)] if subsample_420 else [(1, 1)] * 3
    else:
        comps_raw = [img[:, :, 0]]
        hv = [(1, 1)]
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    # pad to the MCU grid by edge replication, then box-downsample chroma
    py, px = mcuy * vmax * 8, mcux * hmax * 8
    planes = []
    for (ch, cv), plane in zip(hv, comps_raw):
        p = np.pad(plane, ((0, py - height), (0, px - width)), mode="edge")
        fy, fx = vmax // cv, hmax // ch
        if fy > 1 or fx > 1:
            p = p.reshape(py // fy, fy, px // fx, fx).mean(axis=(1, 3))
        planes.append(p)

    q = np.full((8, 8), float(quant))
    # pass 1: tokenize every block (MCU-interleaved order)
    n_tables = 2 if channels == 3 else 1  # (DC, AC) x (luma, chroma)
    dc_syms: list[set] = [set() for _ in range(n_tables)]
    ac_syms: list[set] = [set() for _ in range(n_tables)]
    mcu_tokens: list[list] = []
    pred = [0] * len(planes)
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            pred = [0] * len(planes)
        my, mx = divmod(mcu, mcux)
        toks: list = []
        for ci, (ch, cv) in enumerate(hv):
            t = 0 if ci == 0 else 1
            for by in range(cv):
                for bx in range(ch):
                    zz = _fdct_quant(
                        planes[ci], q, (my * cv + by) * 8, (mx * ch + bx) * 8
                    )
                    btoks, pred[ci] = _block_symbols(zz, pred[ci])
                    for kind, sym, _v in btoks:
                        (dc_syms if kind == "dc" else ac_syms)[t].add(sym)
                    toks.append((t, btoks))
        mcu_tokens.append(toks)

    tables = _build_huffman(dc_syms + ac_syms)  # dc0, [dc1], ac0, [ac1]
    # invert the canonical (length, code) -> sym map to sym -> (len, code)
    enc = []
    for bits, vals in tables:
        m = {}
        for (length, code), sym in _canonical_codes(bits, vals).items():
            m[sym] = (length, code)
        enc.append(m)

    out = bytearray(b"\xff\xd8")

    def segment(marker: int, body: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]) + _struct.pack(">H", len(body) + 2) + body)

    zz_q = bytes(int(q.flat[z]) for z in _ZIGZAG)
    segment(0xDB, b"\x00" + zz_q)  # one flat table, id 0, for all comps
    sof = b"\x08" + _struct.pack(">HH", height, width) + bytes([len(planes)])
    for ci, (ch, cv) in enumerate(hv):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    segment(0xC0, sof)
    for ti, (bits, vals) in enumerate(tables):
        cls = 0 if ti < n_tables else 1  # DC tables first, then AC
        tid = ti % n_tables
        segment(0xC4, bytes([(cls << 4) | tid] + bits + vals))
    if restart_interval:
        segment(0xDD, _struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    segment(0xDA, sos)

    wtr = _BitWriter()
    rst = 0
    for mcu, toks in enumerate(mcu_tokens):
        if restart_interval and mcu and mcu % restart_interval == 0:
            wtr.flush()
            out.extend(wtr.buf)
            wtr = _BitWriter()
            out.extend(b"\xff" + bytes([0xD0 + rst % 8]))
            rst += 1
        for t, btoks in toks:
            for kind, sym, v in btoks:
                table = enc[t] if kind == "dc" else enc[n_tables + t]
                length, code = table[sym]
                wtr.write(code, length)
                s = sym & 15 if kind == "ac" else sym
                if s:
                    wtr.write(v, s)
    wtr.flush()
    out.extend(wtr.buf)
    out.extend(b"\xff\xd9")
    return bytes(out)
